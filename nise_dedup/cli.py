"""spark-submit entry point (SURVEY §3.1-3.2, BASELINE.json packaging).

Usage (cluster):
    zip -r nise_dedup.zip nise_dedup
    spark-submit --py-files nise_dedup.zip -m nise_dedup.cli run \
        --input s3://corpus/table --format iceberg \
        --output /out/clusters --checkpoint /ckpt/run1

    ... cli resume --input ... --checkpoint /ckpt/run1   # skip completed stages

Local sandbox:
    python -m nise_dedup.cli run --input corpus.parquet --output /tmp/out \
        --checkpoint /tmp/ckpt --master 'local[8]'

`resume` is `run` with the same checkpoint dir: completed stage manifests
(matching config hash) are skipped; the first incomplete stage recomputes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from nise_dedup.config import DedupConfig
from nise_dedup.ingest import read_corpus
from nise_dedup.pipeline import run_pipeline
from nise_dedup.session import build_session


def _parse_args(argv):
    p = argparse.ArgumentParser(prog="nise_dedup.cli")
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("run", "resume"):
        s = sub.add_parser(cmd)
        s.add_argument("--input", required=True,
                       help="corpus URI (parquet path or iceberg table)")
        s.add_argument("--format", default="parquet",
                       choices=["parquet", "iceberg"])
        s.add_argument("--output", required=True,
                       help="directory for the clusters parquet")
        s.add_argument("--checkpoint", default="",
                       help="stage checkpoint/manifest dir (enables resume)")
        s.add_argument("--master", default="",
                       help="Spark master; empty = defer to spark-submit")
        s.add_argument("--config", default="{}",
                       help="JSON overrides for DedupConfig fields")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])
    overrides = json.loads(args.config)
    cfg = DedupConfig(**overrides)
    if args.cmd == "resume" and not args.checkpoint:
        raise SystemExit("resume requires --checkpoint")

    spark = build_session(master=args.master, cfg=cfg)
    t0 = time.time()
    corpus = read_corpus(spark, args.input, fmt=args.format)
    res = run_pipeline(spark, corpus, cfg, ckpt=args.checkpoint)
    res.clusters.write.mode("overwrite").parquet(args.output)
    out = dict(res.metrics)
    out["wall_s"] = round(time.time() - t0, 2)
    out["output"] = args.output
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
