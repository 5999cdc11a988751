"""Pluggable model ops (SURVEY.md §2.8) with deterministic defaults.

The reference's three extension points are env-var model swaps for embedding
(app/main.py:67), NER (app/main.py:128-134) and intent (app/main.py:135-139).
Here each is a pluggable callable with a seeded deterministic default so the
data plane stays oracle-testable (SURVEY.md §7.3 risk 4):

- ``embed``  — Arrow-batched hash-projection embedder (S7/S8/M5).
- ``intent`` — rule-based 12-way intent router (M1).
- ``ner``    — dictionary/regex entity tagger + entity->filter builder
  (M2/P2).
"""
