"""Probe-only factor-1000 datapoints for the REMAINING persisted probe
families (r10 verdict task #5): ``bloom_decontaminate_persisted`` and
``lm_perplexity_persisted`` at the sf0.1 / 10× / 100× / 1000× documents
slices — the same four-decade curve the gate
(tools/gate_probe_rehearsal.py), IVF and bm25
(tools/ann_probe_rehearsal.py) families already have.  Timing, plan
fingerprinting, and the table emitter live in
``tools.scale_rehearsal.rehearse_probe`` (shared with the ANN tool so a
methodology fix lands once).

Usage: PYTHONPATH=. python tools/persisted_probe_rehearsal.py
           [--queries bloom_decontaminate_persisted,lm_perplexity_persisted]
           [--slices sf0.1,sf1,sf10,sf100] [--runs 2]
"""

from __future__ import annotations

import argparse

from tools.scale_rehearsal import rehearse_probe

SLICE_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scale/sf1",
    "sf10": "/root/repo/.scale/sf10",
    # documents-only factor-1000 slice (tools/make_scale_slice.py
    # --factor 1000 --tables documents) — both queries read documents
    "sf100": "/root/repo/.scale/sf100_docs",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--queries",
        default="bloom_decontaminate_persisted,lm_perplexity_persisted",
    )
    ap.add_argument("--slices", default="sf0.1,sf1,sf10,sf100")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from paas_auditor_spark.queries import REGISTRY
    from paas_auditor_spark.session import get_spark

    spark = get_spark(app_name="persisted-probe-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for qname in args.queries.split(","):
        rehearse_probe(
            spark,
            REGISTRY[qname].fn,
            SLICE_DIRS,
            args.slices.split(","),
            args.runs,
            qname,
        )


if __name__ == "__main__":
    main()
