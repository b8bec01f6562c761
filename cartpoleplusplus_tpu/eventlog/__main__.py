"""Event-log inspection CLI.

Reference counterpart: the reader/main in the reference's `event_log.py`,
which dumps logged episodes (and optionally PNG frames) for offline
debugging (SURVEY.md §3.5).

Usage:
    python -m cartpoleplusplus_tpu.eventlog dump <file.cpe> [--frames DIR]
    python -m cartpoleplusplus_tpu.eventlog validate <file.cpe>
"""

import argparse
import os
import sys

import numpy as np

from .writer import read_records, validate


def _dump(path: str, frames_dir: str | None):
    n_chunks = 0
    for kind, rec in read_records(path):
        if kind == "metadata":
            print(f"metadata: {rec}")
            continue
        n_chunks += 1
        r = rec["reward"]
        print(f"episode {rec['episode_id']:6d} env {rec['env_id']:5d} "
              f"steps {len(r):4d} return {r.sum():8.2f} "
              f"done {bool(rec['done'][-1])}")
        if frames_dir and rec["frames"] is not None:
            os.makedirs(frames_dir, exist_ok=True)
            out = os.path.join(
                frames_dir,
                f"ep{rec['episode_id']}_env{rec['env_id']}.npy")
            np.save(out, rec["frames"])
    print(f"{n_chunks} chunks")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cartpoleplusplus_tpu.eventlog")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump", help="print episode summaries")
    d.add_argument("path")
    d.add_argument("--frames", default=None,
                   help="directory to dump frame arrays into")
    v = sub.add_parser("validate", help="check framing + CRCs")
    v.add_argument("path")
    args = ap.parse_args(argv)
    if args.cmd == "dump":
        _dump(args.path, args.frames)
    else:
        print(f"{validate(args.path)} records OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
