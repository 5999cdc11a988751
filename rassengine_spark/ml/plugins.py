"""Learned-model plug-ins (optional, import-gated) for the three ML seams.

The reference wires its models through env-var swaps (OLLAMA_EMBED_MODEL
app/main.py:67, NER_MODEL_NAME app/main.py:128-134, INTENT_MODEL_NAME
app/main.py:135-139); this module is the Spark-side equivalent: Hugging Face
models behind the exact same function contracts the deterministic defaults
implement, so `with_embeddings(df, "text", embed_fn=hf_embedder(...))` and
`classify_batch(qs, fn=hf_zero_shot_intent(...))` are drop-in swaps.

Design for executors, not the driver:
- Constructors fail fast on the driver if `transformers`/`torch` are not
  installed (this container has neither — the deterministic defaults in
  embed.py / intent.py / ner.py remain the tested path).
- Model weights load lazily *inside* the returned closure, cached per worker
  process in `_MODEL_CACHE` keyed by (kind, model_name): with mapInPandas /
  pandas_udf each Python worker pays the load once, then every Arrow batch
  reuses it. Never capture a loaded model in the closure itself — it would
  be pickled into every task.
- All three return plain-Python contracts (list[str] -> ndarray,
  str -> str, str -> list[Entity]) so they compose with the existing
  Arrow-batched operators without new plumbing.
"""

from __future__ import annotations

import importlib.util
from typing import TYPE_CHECKING, Callable

if TYPE_CHECKING:  # pragma: no cover
    import numpy as np

from .intent import INTENT_CATEGORIES
from .ner import Entity

_MODEL_CACHE: dict[tuple[str, str], object] = {}


def hf_available() -> bool:
    """True when the optional transformers+torch stack is importable."""
    return (importlib.util.find_spec("transformers") is not None
            and importlib.util.find_spec("torch") is not None)


def _require_hf(what: str) -> None:
    if not hf_available():
        raise RuntimeError(
            f"{what} needs the optional 'transformers' + 'torch' packages; "
            "they are not installed. Use the deterministic default "
            "(hash_ngram_embedder / classify_intent / tag_entities) or "
            "install the extras.")


def hf_embedder(model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                batch_size: int = 64) -> Callable[[list[str]], "np.ndarray"]:
    """EmbedFn plug-in: mean-pooled last-hidden-state, L2-normalized
    (S8 semantics, app/main.py:1250-1251). Same (n texts) -> (n, dim)
    contract as hash_ngram_embedder; empty text -> zero vector
    (app/main.py:227-228)."""
    _require_hf("hf_embedder")

    def embed(texts: list[str]) -> "np.ndarray":
        import numpy as np
        import torch  # noqa: PLC0415

        key = ("embed", model_name)
        if key not in _MODEL_CACHE:
            from transformers import AutoModel, AutoTokenizer
            tok = AutoTokenizer.from_pretrained(model_name)
            mdl = AutoModel.from_pretrained(model_name).eval()
            _MODEL_CACHE[key] = (tok, mdl)
        tok, mdl = _MODEL_CACHE[key]

        dim = mdl.config.hidden_size
        out = np.zeros((len(texts), dim), dtype=np.float32)
        live = [(i, t) for i, t in enumerate(texts) if (t or "").strip()]
        with torch.no_grad():
            for s in range(0, len(live), batch_size):
                chunk = live[s:s + batch_size]
                enc = tok([t for _, t in chunk], padding=True,
                          truncation=True, return_tensors="pt")
                hid = mdl(**enc).last_hidden_state
                mask = enc["attention_mask"].unsqueeze(-1).float()
                mean = (hid * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
                vecs = mean.cpu().numpy().astype(np.float32)
                norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                vecs = vecs / (norms + 1e-9)
                for (i, _), v in zip(chunk, vecs):
                    out[i] = v
        return out

    return embed


def hf_zero_shot_intent(model_name: str = "facebook/bart-large-mnli",
                        labels: list[str] | None = None,
                        ) -> Callable[[str], str]:
    """Intent-router plug-in: zero-shot NLI with the reference's hypothesis
    template "This example is about {}." over the 12 labels, argmax
    entailment (classify_intent, app/main.py:2613-2634). Same str -> label
    contract as intent.classify_intent, so it slots into classify_batch."""
    _require_hf("hf_zero_shot_intent")
    cats = labels or INTENT_CATEGORIES

    def classify(query: str) -> str:
        key = ("intent", model_name)
        if key not in _MODEL_CACHE:
            from transformers import pipeline
            _MODEL_CACHE[key] = pipeline("zero-shot-classification",
                                         model=model_name)
        pipe = _MODEL_CACHE[key]
        res = pipe(query, cats,
                   hypothesis_template="This example is about {}.")
        return res["labels"][0]

    return classify


def hf_token_ner(model_name: str,
                 threshold: float = 0.80) -> Callable[[str], list[Entity]]:
    """NER plug-in: token-classification with BIO aggregation and the
    reference's 0.80 confidence floor (_bio_ner, app/main.py:2418-2480,
    threshold app/main.py:2414). Same str -> list[Entity] contract as
    ner.tag_entities, so entities_to_filter (P2) applies unchanged."""
    _require_hf("hf_token_ner")

    def tag(query: str) -> list[Entity]:
        key = ("ner", model_name)
        if key not in _MODEL_CACHE:
            from transformers import pipeline
            _MODEL_CACHE[key] = pipeline("token-classification",
                                         model=model_name,
                                         aggregation_strategy="simple")
        pipe = _MODEL_CACHE[key]
        return [Entity(h["word"], h["entity_group"])
                for h in pipe(query) if h["score"] >= threshold]

    return tag


def hf_cross_encoder(model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"
                     ) -> Callable[[str, list[str]], list[float]]:
    """RerankFn plug-in: cross-encoder relevance scoring of (query, text)
    pairs — the second-stage scorer `ml.rerank.rerank_topk` accepts. Same
    (query, texts) -> scores contract as the deterministic term-Jaccard
    default, so first-stage retrieval and the ask pipeline are unchanged
    when the model swaps in. Scores each candidate batch in one forward
    pass; the candidate set is first-stage top-k, so inference cost is
    O(k) texts per query regardless of corpus size."""
    _require_hf("hf_cross_encoder")

    def score(query: str, texts: list[str]) -> list[float]:
        if not texts:
            return []
        key = ("rerank", model_name)
        if key not in _MODEL_CACHE:
            from transformers import (AutoModelForSequenceClassification,
                                      AutoTokenizer)
            tok = AutoTokenizer.from_pretrained(model_name)
            mdl = AutoModelForSequenceClassification.from_pretrained(
                model_name)
            mdl.eval()
            _MODEL_CACHE[key] = (tok, mdl)
        tok, mdl = _MODEL_CACHE[key]
        import torch
        with torch.no_grad():
            enc = tok([query] * len(texts), texts, padding=True,
                      truncation=True, return_tensors="pt")
            return mdl(**enc).logits.squeeze(-1).tolist()

    return score
