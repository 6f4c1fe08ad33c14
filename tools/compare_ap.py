#!/usr/bin/env python
"""AP-parity gate: compare detection metrics within tolerance.

Third command of docs/PARITY_RUNBOOK.md (BASELINE.md north star: BOP AP
within 0.2 of the released checkpoint). Exits 0 iff every compared key is
within --tol.

Usage:
  # compare two metric dumps (tools/test.py --eval bbox prints one as JSON)
  python tools/compare_ap.py got.json expected.json --keys bbox_mAP --tol 0.2

  # compare against literal expected values (e.g. the paper's table)
  python tools/compare_ap.py got.json --expect bbox_mAP=0.545 --tol 0.2
"""

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("got", help="metrics JSON produced by tools/test.py --eval bbox")
    p.add_argument("expected", nargs="?", default=None, help="expected metrics JSON")
    p.add_argument(
        "--expect",
        nargs="+",
        default=None,
        metavar="KEY=VALUE",
        help="literal expected values instead of an expected-metrics file",
    )
    p.add_argument(
        "--keys",
        nargs="+",
        default=["bbox_mAP"],
        help="metric keys to compare (default: bbox_mAP)",
    )
    p.add_argument("--tol", type=float, default=0.2, help="absolute tolerance")
    args = p.parse_args()

    with open(args.got) as f:
        got = json.load(f)
    if args.expect:
        expected = {}
        for kv in args.expect:
            k, _, v = kv.partition("=")
            expected[k] = float(v)
        keys = list(expected)
    else:
        if not args.expected:
            p.error("provide an expected-metrics file or --expect KEY=VALUE")
        with open(args.expected) as f:
            expected = json.load(f)
        keys = args.keys

    ok = True
    for k in keys:
        if k not in got or k not in expected:
            print(f"MISSING  {k}: got={got.get(k)} expected={expected.get(k)}")
            ok = False
            continue
        diff = abs(float(got[k]) - float(expected[k]))
        status = "OK " if diff <= args.tol else "FAIL"
        if diff > args.tol:
            ok = False
        print(
            f"{status} {k}: got={float(got[k]):.4f} expected={float(expected[k]):.4f} "
            f"|diff|={diff:.4f} tol={args.tol}"
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
