"""Reproduce every performance number quoted in README.md on the attached
TPU, in one run. Each result prints as a labelled JSON line.

Usage: python scripts/run_all_benches.py [--quick]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(label, cmd):
    print(json.dumps({"bench": label, "cmd": " ".join(cmd)}))
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=900)
    out = (r.stdout or "").strip().splitlines()
    tail = out[-1] if out else (r.stderr or "").strip().splitlines()[-1:]
    print(json.dumps({"bench": label, "result": tail}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="skip the slowest runs")
    args = p.parse_args()

    py = sys.executable
    run("spi_encode_regions_per_sec", [py, "bench.py"])
    run("decode_7b_tok_per_sec", [py, "scripts/bench_decode.py", "--layers", "32", "--batch", "1", "--steps", "256", "--seq", "512"])
    if not args.quick:
        run("decode_batched_16L_b8", [py, "scripts/bench_decode.py", "--layers", "16", "--batch", "8", "--steps", "128", "--seq", "512"])
        run("train_stage1_step", [py, "scripts/bench_train.py", "--layers", "2", "--batch", "2", "--seq", "512", "--stage", "stage1"])


if __name__ == "__main__":
    main()
