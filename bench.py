#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line (see bin_tpu/benchmark.py)."""

from bin_tpu.benchmark import main

if __name__ == "__main__":
    main()
