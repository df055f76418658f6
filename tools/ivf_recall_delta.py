"""Measure recall@k of the seed vs Lloyd-refined IVF quantizer against
exact brute force — the number quoted in sim_ann_ivf_trained's docstring.

Usage: python tools/ivf_recall_delta.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.queries import similarity as S  # noqa: E402


def recall(bf_pairs, ann_df) -> float:
    ann = {(r["qid"], r["cid"]) for r in ann_df.select("qid", "cid").collect()}
    return len(bf_pairs & ann) / len(bf_pairs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ivf_recall_delta")
    bf = {
        (r["qid"], r["cid"])
        for r in S.sim_topk_bruteforce(spark, sf_dir).select("qid", "cid").collect()
    }
    seed = recall(bf, S.sim_ann_ivf(spark, sf_dir))
    trained = recall(bf, S.sim_ann_ivf_trained(spark, sf_dir))
    print(
        f"sf_dir={sf_dir} k={S._TOP_K} nprobe={S._IVF_NPROBE} "
        f"cells={S._IVF_CELLS}: recall seed={seed:.4f} trained={trained:.4f} "
        f"delta={trained - seed:+.4f}"
    )


if __name__ == "__main__":
    main()
