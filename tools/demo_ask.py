"""End-to-end /ask demo (SURVEY §3.1): ingest a tiny FHIR + notes corpus,
then run a mixed question workload through the full lifecycle —
NER filter -> intent routing -> dispatched search -> context assembly ->
(template) answer — and print each stage's result.

Run:  python tools/demo_ask.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUESTIONS = [
    "How many patients have hypertension?",
    "Get details for patient Julian Q Stamm",
    "Search for headache treatment options",
    "Explain the elevated bp recheck note",
    "Show me blood pressure trends over time",
]


def main() -> None:
    import dataclasses

    from rassengine_spark.config import DEFAULT
    from rassengine_spark.pipeline.ask import AskPipeline
    from rassengine_spark.pipeline.ingest import run_ingest
    from rassengine_spark.session import get_spark
    from tests.test_fhir import BUNDLE

    spark = get_spark("demo-ask")
    root = tempfile.mkdtemp(prefix="demo_uploads_")
    wh = tempfile.mkdtemp(prefix="demo_wh_")
    with open(os.path.join(root, "patient_1_bundle.json"), "w") as f:
        json.dump(BUNDLE, f)
    with open(os.path.join(root, "patient_1_history.txt"), "w") as f:
        f.write("Patient reports chronic headaches since 2019. "
                "Treated with ibuprofen as needed.")

    counts = run_ingest(spark, root, "demo-user", wh, chunk_size=64, dim=16)
    print(f"ingested: {counts}")

    docs = spark.read.parquet(os.path.join(wh, "documents"))
    chunks = spark.read.parquet(os.path.join(wh, "chunks"))
    chats = spark.createDataFrame([], "id string, userId string, title string")
    messages = spark.createDataFrame(
        [], "id string, chatId string, role string, content string, "
            "createdAt timestamp")
    # pin 'now' near the corpus dates so TEMPORAL's now-1y window matches
    cfg = dataclasses.replace(DEFAULT, now="2024-07-01 00:00:00")
    pipe = AskPipeline(docs, chunks, chats, messages, config=cfg, dim=16)

    for q in QUESTIONS:
        res = pipe.ask(q, "demo-user")
        print("=" * 72)
        print(f"Q: {q}")
        print(f"intent: {res.intent}")
        if res.aggregations:
            print(f"aggregations: {res.aggregations}")
        elif res.hits is not None:
            for r in res.hits.limit(3).collect():
                print(f"  hit: {r.doc_id}  score={getattr(r, 'score', None)}")
        print(f"answer: {res.answer[:200]}")


if __name__ == "__main__":
    main()
