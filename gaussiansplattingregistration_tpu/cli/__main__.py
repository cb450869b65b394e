"""`python -m gaussiansplattingregistration_tpu.cli` entry point."""

from gaussiansplattingregistration_tpu.cli.main import main

main()
