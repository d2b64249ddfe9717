"""Near-dup quality harness: recall/precision of the approximate dedup
paths vs exact all-pairs Jaccard ground truth.

    python tools/dedup_eval.py [sf_dir] [min_jaccard]

Ground truth: EXACT shingle-set Jaccard for every document pair sharing at
least one shingle (inverted-index generation — no df cap, no LSH — then
exact |A∩B| / |A∪B|), thresholded at ``min_jaccard``. Feasible only at
eval scale; that is the point — the harness certifies, the capped/banded
kernels deploy.

Scored paths:

- ``minhash_lsh``   — candidate recall (does banding surface the pair?)
  and candidate precision (how much of the candidate set is real?).
- ``ngram_jaccard`` — the LSH-then-verify kernel: verified pairs vs truth
  (recall only; its precision is 1.0 by construction since it computes
  the same exact Jaccard on the candidates).
- ``winnowing``     — pairs sharing >= 2 winnowed fingerprints.

`test_dedup_eval_harness` pins LSH recall on the synthetic corpus so a
banding regression (e.g. a band-key bug silently emptying buckets) fails
CI, the same contract ann_eval pins for the ANN family.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_meta_spark.pipeline import dedup, winnow


def exact_truth_pairs(docs: DataFrame, shingle_k: int, min_jaccard: float) -> DataFrame:
    """All-pairs exact Jaccard >= threshold via an UNCAPPED inverted index.

    Eval-scale only (the deployment kernels cap or band candidate
    generation precisely because this goes quadratic on boilerplate).
    """
    sh = dedup._word_shingles(docs, shingle_k).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= min_jaccard)
        .select("doc_a", "doc_b")
    )


def evaluate(spark, sf_dir: str, min_jaccard: float = 0.5) -> dict[str, dict]:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = {
        (r.doc_a, r.doc_b)
        for r in exact_truth_pairs(docs, shingle_k=3, min_jaccard=min_jaccard).collect()
    }

    def prf(pairs: set) -> dict:
        tp = len(pairs & truth)
        return {
            "n_truth": len(truth),
            "n_found": len(pairs),
            "recall": round(tp / len(truth), 4) if truth else None,
            "precision": round(tp / len(pairs), 4) if pairs else None,
        }

    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, shingle_k=3).select("doc_a", "doc_b").collect()
    }
    verified = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, shingle_k=3, min_jaccard=min_jaccard)
        .select("doc_a", "doc_b")
        .collect()
    }
    winnowed = {
        (r.doc_a, r.doc_b)
        for r in winnow.winnow_dup_pairs(docs).select("doc_a", "doc_b").collect()
    }
    return {
        "minhash_lsh_candidates": prf(lsh),
        "ngram_jaccard_verified": prf(verified),
        "winnowing": prf(winnowed),
    }


def main() -> None:
    import json

    from iceberg_meta_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_j = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("dedup-eval", cpus="8")
    print(json.dumps(evaluate(spark, sf_dir, min_j), indent=2))


if __name__ == "__main__":
    main()
