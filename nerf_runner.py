#!/usr/bin/env python
"""CLI entry point (same surface as the reference's nerf_runner.py):

    python nerf_runner.py --op {train,eval,video,view} [--configPath configs/train.json] ...
"""

from acn_tpu.runner import main

if __name__ == "__main__":
    main()
