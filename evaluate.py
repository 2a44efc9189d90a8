#!/usr/bin/env python
"""Entry point mirroring the reference CLI: python evaluate.py <flags>."""
from floodgan_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
