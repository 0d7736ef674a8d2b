#!/usr/bin/env python
"""CLI shim matching the reference's `python run_rhe.py ...` entry point."""
from pyrhe_tpu.cli import cli_entry

if __name__ == "__main__":
    cli_entry()
