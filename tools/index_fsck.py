"""CheckIndex-style integrity audit of a committed index.

    python tools/index_fsck.py --index-dir /path/to/index [--generation N]
        [--master local[8]]

Prints one JSON line {"checks": N, "bad": M, "rows": [...]} and exits
non-zero iff any invariant is violated (bad > 0) — suitable as a
post-build / post-merge / post-restore cluster job.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--generation", type=int, default=None)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from clucene_spark.index.fsck import check_index
    from clucene_spark.session import get_spark

    spark = get_spark("index_fsck", master=args.master)
    rows = (
        check_index(spark, args.index_dir, generation=args.generation)
        .orderBy("segment", "check")
        .collect()
    )
    out = {
        "checks": int(sum(r["n_checked"] for r in rows)),
        "bad": int(sum(r["n_bad"] for r in rows)),
        "rows": [
            {
                "segment": r["segment"],
                "check": r["check"],
                "n_checked": int(r["n_checked"]),
                "n_bad": int(r["n_bad"]),
                **({"detail": r["detail"]} if r["detail"] else {}),
            }
            for r in rows
        ],
    }
    print(json.dumps(out))
    sys.exit(0 if out["bad"] == 0 else 1)


if __name__ == "__main__":
    main()
