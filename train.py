#!/usr/bin/env python
"""Entry point mirroring the reference CLI: python train.py <flags>."""
from floodgan_tpu.cli.train import main

if __name__ == "__main__":
    main()
