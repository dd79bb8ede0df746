#!/usr/bin/env python
"""Convert a bin_tpu metrics.jsonl into TensorBoard event files.

The train loop's primary sink is JSONL (bin_tpu/utils/logging.py — no TF
summary dependency in the hot path); this tool layers TensorBoard on top
(SURVEY.md §6.5: the reference's observability is AverageMeter prints +
possibly TensorBoard scalars).

Usage: python tools/jsonl_to_tensorboard.py runs/myrun/metrics.jsonl \
           [--logdir runs/myrun/tb]

With --follow, keeps tailing the file (live dashboards during training).
"""

import argparse
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("jsonl")
    p.add_argument("--logdir", default=None,
                   help="event-file dir (default: <jsonl_dir>/tb)")
    p.add_argument("--follow", action="store_true",
                   help="keep tailing the JSONL for new records")
    args = p.parse_args()

    try:
        import tensorflow as tf
    except ImportError:
        sys.exit("tensorflow is required for TensorBoard export")

    logdir = args.logdir or os.path.join(
        os.path.dirname(os.path.abspath(args.jsonl)), "tb")
    writer = tf.summary.create_file_writer(logdir)
    n = 0
    with writer.as_default(), open(args.jsonl) as f:
        while True:
            line = f.readline()
            if not line:
                writer.flush()
                if not args.follow:
                    break
                time.sleep(2.0)
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # partial tail line while the trainer is writing
            step = int(rec.pop("step", n))
            for key, val in rec.items():
                if isinstance(val, (int, float)):
                    tf.summary.scalar(key, float(val), step=step)
            n += 1
    print(f"wrote {n} records -> {logdir}")


if __name__ == "__main__":
    main()
