"""Command-line entry point: the engine's job surface as a CLI, so a user
of the reference's REST endpoints has a direct equivalent for each flow.

    python -m rassengine_spark ingest --src DIR --warehouse DIR [--user U]
        the /upload_data flow (SURVEY §3.3): parse FHIR bundles / NDJSON /
        text / markdown, chunk, embed (deterministic default embedder),
        upsert into warehouse parquet tables.

    python -m rassengine_spark ask "QUESTION" --warehouse DIR [--top-k K]
        the /ask flow (SURVEY §3.1): NER filter -> intent route ->
        dispatched search -> context assembly -> (template) answer. Prints
        intent, hits, and the answer. `--rerank` enables the second-stage
        term-overlap rerank.

    python -m rassengine_spark prep --src PARQUET --out DIR
        the training-data prep pipeline (llmops/prep.py) over a parquet of
        (doc_id, text [, ...]): dedup -> quality -> PII -> split; writes
        the cleaned corpus partitioned by split and prints the stage
        report.

Models stay pluggable: the CLI wires the deterministic defaults; swap in
ml/plugins.py constructors programmatically for real models.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_ingest(args) -> int:
    from .pipeline.ingest import run_ingest
    from .session import get_spark

    spark = get_spark("cli-ingest")
    counts = run_ingest(spark, args.src, args.user, args.warehouse,
                        chunk_size=args.chunk_size, dim=args.dim)
    print(json.dumps({"warehouse": args.warehouse, **counts}))
    return 0


def _cmd_ask(args) -> int:
    import os

    from .pipeline.ask import AskPipeline
    from .session import get_spark

    spark = get_spark("cli-ask")
    docs = spark.read.parquet(os.path.join(args.warehouse, "documents"))
    chunks = spark.read.parquet(os.path.join(args.warehouse, "chunks"))
    pipe = AskPipeline(docs, chunks, dim=args.dim, rerank=args.rerank)
    res = pipe.ask(args.question, top_k=args.top_k)
    print(f"intent: {res.intent}")
    if res.hits is not None:
        for r in res.hits.select("doc_id").collect():
            print(f"hit: {r['doc_id']}")
    print(f"answer: {res.answer}")
    return 0


def _cmd_prep(args) -> int:
    from pyspark.sql import functions as F

    from .llmops.prep import prepare_training_corpus
    from .session import get_spark

    spark = get_spark("cli-prep")
    docs = spark.read.parquet(args.src)
    out, report = prepare_training_corpus(
        docs, None, text_col=args.text_col, id_col=args.id_col,
        materialize=True)
    (out.write.mode("overwrite").partitionBy("split").parquet(args.out))
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"stages": report, "out": args.out, "rows": n}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rassengine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="parse + chunk + embed + upsert")
    pi.add_argument("--src", required=True)
    pi.add_argument("--warehouse", required=True)
    pi.add_argument("--user", default="default")
    pi.add_argument("--chunk-size", type=int, default=512)
    pi.add_argument("--dim", type=int, default=64)
    pi.set_defaults(fn=_cmd_ingest)

    pa = sub.add_parser("ask", help="intent-routed search + answer")
    pa.add_argument("question")
    pa.add_argument("--warehouse", required=True)
    pa.add_argument("--top-k", type=int, default=3)
    pa.add_argument("--dim", type=int, default=64)
    pa.add_argument("--rerank", action="store_true")
    pa.set_defaults(fn=_cmd_ask)

    pp = sub.add_parser("prep", help="training-data prep pipeline")
    pp.add_argument("--src", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--text-col", default="text")
    pp.add_argument("--id-col", default="doc_id")
    pp.set_defaults(fn=_cmd_prep)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
