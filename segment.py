#!/usr/bin/env python
"""Entry point mirroring the reference CLI: python segment.py <flags>."""
from floodgan_tpu.cli.segment import main

if __name__ == "__main__":
    main()
