"""Ray stages for text analysis over a documents table
(doc_id, text, lang, source, n_chars): language-ID, quality signals,
token counts, fingerprints — the per-batch wrappers around
functions/textstats.py kernels."""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import (
    count_tokens_bpe,
    count_tokens_whitespace,
    detect_language,
    document_fingerprint,
    quality_signals,
    text_hash64,
)


class LangIdStage:
    """Actor-pool stage: stopword tables are module-level, but the class
    form keeps the stage shape uniform (and ready for a model)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, confs = [], []
        for text in batch[self.text_col].to_pylist():
            lang, conf = detect_language(text or "")
            langs.append(lang)
            confs.append(conf)
        return batch.append_column("pred_lang", pa.array(langs, pa.string())).append_column(
            "lang_confidence", pa.array(confs, pa.float64())
        )


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    ws, bpe = [], []
    for text in batch[text_col].to_pylist():
        text = text or ""
        ws.append(count_tokens_whitespace(text))
        bpe.append(count_tokens_bpe(text))
    return batch.append_column("n_tokens_ws", pa.array(ws, pa.int64())).append_column(
        "n_tokens_bpe", pa.array(bpe, pa.int64())
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    cols: dict[str, list] = {}
    for text in batch[text_col].to_pylist():
        sig = quality_signals(text or "")
        for k, v in sig.items():
            cols.setdefault(k, []).append(v)
    out = batch
    for k in ("n_words", "mean_word_len", "stopword_ratio", "punct_ratio",
              "dup_line_ratio", "alpha_ratio", "quality_score"):
        out = out.append_column(f"q_{k}", pa.array(cols[k], pa.float64()))
    return out


def chunk_batch(batch: pa.Table, *, text_col: str = "text",
                key_col: str = "doc_id", chunk_words: int = 100,
                overlap: int = 20) -> pa.Table:
    """Sliding-window document chunking (the LLM-training staple): each
    doc becomes ceil-ish windows of ``chunk_words`` whitespace tokens
    advancing by ``chunk_words - overlap``; the last window is the
    remainder (non-empty docs always yield >= 1 chunk).  1 doc -> N
    chunk rows inside one map_batches — the fan-out never shuffles."""
    if overlap >= chunk_words:
        raise ValueError("overlap must be < chunk_words")
    step = chunk_words - overlap
    keys, chunk_nos, texts, n_toks = [], [], [], []
    for key, text in zip(batch[key_col].to_pylist(), batch[text_col].to_pylist()):
        words = (text or "").split()
        if not words:
            keys.append(key)
            chunk_nos.append(0)
            texts.append("")
            n_toks.append(0)
            continue
        start = 0
        chunk_no = 0
        while True:
            window = words[start : start + chunk_words]
            keys.append(key)
            chunk_nos.append(chunk_no)
            texts.append(" ".join(window))
            n_toks.append(len(window))
            if start + chunk_words >= len(words):
                break
            start += step
            chunk_no += 1
    return pa.table(
        {
            key_col: pa.array(keys, batch[key_col].type),
            "chunk_no": pa.array(chunk_nos, pa.int64()),
            "chunk_text": pa.array(texts, pa.large_string()),
            "n_tokens": pa.array(n_toks, pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps, hashes = [], []
    for text in batch[text_col].to_pylist():
        text = text or ""
        fps.append(document_fingerprint(text))
        hashes.append(text_hash64(text))
    return batch.append_column("fingerprint", pa.array(fps, pa.int64())).append_column(
        "text_hash", pa.array(hashes, pa.int64())
    )


def repetition_signals(text: str) -> dict:
    """Gopher-style repetition metrics (Rae et al. A1.1): fraction of
    characters inside duplicated word n-grams (n=2,3) and the count
    fraction of the single most frequent 2-gram.  A doc dominated by a
    repeated phrase scores high and gets filtered before training.

    Ratios are each ONE IEEE division of two exact integers, so the
    DuckDB oracle reproduces them bit-for-bit."""
    from collections import Counter

    words = text.split()
    out = {}
    for n, name in ((2, "dup2"), (3, "dup3")):
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
        if not grams:
            out[f"{name}_frac"] = 0.0
            if n == 2:
                out["top2_frac"] = 0.0
            continue
        c = Counter(grams)
        tot = sum(cnt * len(g) for g, cnt in c.items())
        dup = sum(cnt * len(g) for g, cnt in c.items() if cnt > 1)
        out[f"{name}_frac"] = dup / tot if tot else 0.0
        if n == 2:
            out["top2_frac"] = max(c.values()) / len(grams)
    return out


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc repetition signals; same per-token cost class as the
    token counters (Counter over the word stream, no quadratic work)."""
    cols: dict[str, list] = {"dup2_frac": [], "dup3_frac": [], "top2_frac": []}
    for text in batch[text_col].to_pylist():
        sig = repetition_signals(text or "")
        for k in cols:
            cols[k].append(sig[k])
    out = batch.drop_columns([text_col])
    for k, v in cols.items():
        out = out.append_column(k, pa.array(v, pa.float64()))
    return out


def curate_signals_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Fused filter-signal pass for the curation pipeline: whitespace
    token count + duplicated-2-gram char fraction in ONE pass over the
    text (the scale answer: one decode of the column, not one per
    signal).  Text is KEPT — downstream exact-dedup still needs it."""
    nts, d2s = [], []
    for text in batch[text_col].to_pylist():
        text = text or ""
        nts.append(count_tokens_whitespace(text))
        d2s.append(repetition_signals(text)["dup2_frac"])
    return batch.append_column(
        "n_tokens_ws", pa.array(nts, pa.int64())).append_column(
        "dup2_frac", pa.array(d2s, pa.float64()))


class OovScorer:
    """Actor-pool stage: per-doc out-of-vocabulary rate against a
    BROADCAST vocabulary — the coverage audit run before committing to
    a tokenizer/vocab for training.  ``vocab_ref`` is a ``ray.put``
    handle to the word list; the set is materialized ONCE per actor in
    ``__init__`` (the model-broadcast pattern of ops/classify.py).
    ``oov_bps`` is integer basis points (n_oov * 10000 // n_tokens) so
    the value hash-matches the SQL oracle exactly.

    Scale shape: the vocab is tiny and broadcast; the corpus streams
    through with no shuffle."""

    def __init__(self, vocab_ref, *, text_col: str = "text"):
        import ray

        self.vocab = frozenset(ray.get(vocab_ref))
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tok, n_oov, bps = [], [], []
        vocab = self.vocab
        for text in batch[self.text_col].to_pylist():
            words = (text or "").split()
            oov = sum(1 for w in words if w not in vocab)
            n_tok.append(len(words))
            n_oov.append(oov)
            bps.append(oov * 10000 // len(words) if words else 0)
        out = batch.drop_columns([self.text_col])
        return (out.append_column("n_tokens", pa.array(n_tok, pa.int64()))
                .append_column("n_oov", pa.array(n_oov, pa.int64()))
                .append_column("oov_bps", pa.array(bps, pa.int64())))
