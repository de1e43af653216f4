"""Probe-only factor-1000 datapoint for the persisted IVF ANN path
(SURVEY r11 candidate #3, pulled into r10): the registered
``knn_ivf_persisted`` probe at sf0.1 / 10× / 100× / 1000× embeddings
slices — build-once (cached, run 1) then probe-only best-of-N, with
the plan-shape fingerprint diffed across slices.  Timing, plan
fingerprinting, and the table emitter live in
``tools.scale_rehearsal.rehearse_probe`` (shared with the persisted
tool so a methodology fix lands once).

Usage: PYTHONPATH=. python tools/ann_probe_rehearsal.py
           [--slices sf0.1,sf1,sf10,sf100] [--runs 2]
"""

from __future__ import annotations

import argparse

from tools.scale_rehearsal import rehearse_probe

SLICE_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scale/sf1",
    "sf10": "/root/repo/.scale/sf10",
    # embeddings-only factor-1000 slice (tools/make_scale_slice.py
    # --factor 1000 --tables embeddings) — the query only reads it
    "sf100": "/root/repo/.scale/sf100_emb",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slices", default="sf0.1,sf1,sf10,sf100")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from paas_auditor_spark.queries import REGISTRY
    from paas_auditor_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rehearse_probe(
        spark,
        REGISTRY["knn_ivf_persisted"].fn,
        SLICE_DIRS,
        args.slices.split(","),
        args.runs,
        "knn_ivf_persisted",
    )


if __name__ == "__main__":
    main()
