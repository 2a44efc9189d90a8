#!/usr/bin/env python
"""Entry point mirroring the reference CLI: python compare.py <flags>."""
from floodgan_tpu.cli.compare import main

if __name__ == "__main__":
    main()
