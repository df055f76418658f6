"""Recall ladder over every registered ANN family — the numbers behind
RECALL_r{N}.md. Runs each index's registry entry (NOT a re-implementation)
against exact brute force on the given embeddings dir and prints one
table row per configuration with its candidate-volume cost shape.

Usage: python tools/recall_eval.py [dir=.tmp_io/recall_eval]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from doreisa_spark.queries import similarity as S  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".tmp_io/recall_eval"
    spark = get_spark("recall_eval")
    bf = {
        (r["qid"], r["cid"])
        for r in S.sim_topk_bruteforce(spark, sf_dir).select("qid", "cid").collect()
    }

    def recall(df) -> float:
        got = {(r["qid"], r["cid"]) for r in df.select("qid", "cid").collect()}
        return len(bf & got) / len(bf)

    rows = [
        ("sign-LSH (8 planes)", S.sim_ann_lsh, "1 bucket (~n/256)"),
        ("sign-LSH multiprobe (Hamming-1)", S.sim_ann_multiprobe, "9 buckets"),
        (f"IVF-Flat seed (nprobe={S._IVF_NPROBE}/{S._IVF_CELLS})", S.sim_ann_ivf,
         f"{S._IVF_NPROBE} cells (~n·{S._IVF_NPROBE}/{S._IVF_CELLS})"),
        ("IVF-Flat trained (1 Lloyd step)", S.sim_ann_ivf_trained,
         f"{S._IVF_NPROBE} cells"),
        ("IVF-PQ (4x16 codes + exact rerank)", S.sim_ann_ivf_pq,
         f"{S._IVF_NPROBE} cells of 4-byte codes"),
        (f"IVF-PQ deep rerank (shortlist {S._PQ_SHORTLIST_DEEP})",
         S.sim_ann_ivf_pq_deep,
         f"{S._IVF_NPROBE} cells of codes + {S._PQ_SHORTLIST_DEEP}-row rerank"),
    ]
    print(f"dir={sf_dir} k={S._TOP_K} queries={S._N_QUERIES}")
    for name, fn, cost in rows:
        r = recall(fn(spark, sf_dir))
        print(f"| {name} | {r:.3f} | {cost} |")
    spark.stop()


if __name__ == "__main__":
    main()
