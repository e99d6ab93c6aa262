"""Structured-extraction stage: the reference's vision-LLM
generate+validate path (SURVEY.md A2, M21, M22, V7) rebuilt as a Ray
actor-pool stage with a deterministic in-sandbox provider.

Reference shape (packages/pdf-processor/src/core/vision/
ai-generator.ts:50-159 and provider factory ai-provider.ts):

- provider client factory (A2): named providers map to client classes;
  the client is built ONCE per worker (here: actor ``__init__``), not
  per document
- prompt builder (M21): schema field inventory + extraction
  instructions + the document content
- image message formatter (M22): page images as data-URL message parts
- generate -> validate -> retry loop (V7): on validation failure the
  prompt gains a repair hint and the model is re-asked, at most
  ``max_retries`` times; persistent failure is DATA
  (valid=False + error strings), never an exception

No LLM exists in this environment, so the only registered provider is
``fake``: a seeded deterministic model that "reads" planted fields out
of the document text and exhibits deterministic failure modes
(malformed JSON on first attempt for doc_id % 7 == 0, an
out-of-range confidence_score for doc_id % 13 == 0) so the retry and
failure paths are exercised and SQL-oracle-checkable.  Swapping in a
real provider changes only ``make_client``.
"""

from __future__ import annotations

import base64
import json
import re

import pyarrow as pa

from ..schemas import COMPREHENSIVE_INVOICE_TYPE, validate_record

# ---------------------------------------------------------------------------
# prompt builder (M21) + image message formatter (M22)
# ---------------------------------------------------------------------------


def _field_inventory(patype: pa.DataType, prefix: str = "") -> list[str]:
    out = []
    if pa.types.is_struct(patype):
        for field in patype:
            out.extend(_field_inventory(field.type, f"{prefix}{field.name}."))
    elif pa.types.is_list(patype):
        out.extend(_field_inventory(patype.value_type, f"{prefix}[]."))
    else:
        out.append(f"{prefix.rstrip('.')}: {patype}")
    return out


def build_prompt(target: pa.DataType, document_text: str) -> str:
    """Schema-derived extraction prompt (ai-generator.ts:50-98 role)."""
    fields = "\n".join(f"- {f}" for f in _field_inventory(target)[:80])
    return (
        "Extract the following fields from the document as strict JSON.\n"
        "Missing fields must be null. Do not invent values.\n\n"
        f"FIELDS:\n{fields}\n\nDOCUMENT:\n{document_text}"
    )


def format_image_message(payload: bytes, mime: str = "image/png") -> dict:
    """Vision message part with a base64 data URL
    (ai-generator.ts image message role, M22)."""
    b64 = base64.b64encode(payload).decode("ascii")
    return {"type": "image_url", "image_url": {"url": f"data:{mime};base64,{b64}"}}


# ---------------------------------------------------------------------------
# provider client factory (A2)
# ---------------------------------------------------------------------------

_INV_NO_RE = re.compile(r"Invoice No:\s*(INV-(\d+))")
_DATE_RE = re.compile(r"Date:\s*(\d{4}-\d{2}-\d{2})")
_TOTAL_RE = re.compile(r"Total:\s*([0-9]+\.[0-9]{2})\s*([A-Z]{3})")


class FakeLlmClient:
    """Seeded deterministic 'model': perfect regex reader of the planted
    invoice fields, plus deterministic failure injection keyed on the
    invoice number so the stage's retry/failure paths run and the
    output stays SQL-reconstructable."""

    def __init__(self, seed: int = 1234):
        self.seed = seed

    def generate(self, prompt: str) -> str:
        doc = prompt.rsplit("DOCUMENT:\n", 1)[-1]
        m_no = _INV_NO_RE.search(doc)
        doc_id = int(m_no.group(2)) if m_no else 0
        # failure mode 1: malformed JSON on the first attempt (repaired
        # when the retry prompt carries the REPAIR hint)
        if doc_id % 7 == 0 and "REPAIR:" not in prompt:
            return '{"document_info": {'
        m_date = _DATE_RE.search(doc)
        m_total = _TOTAL_RE.search(doc)
        # failure mode 2: schema-invalid confidence on EVERY attempt
        confidence = 1.5 if doc_id % 13 == 0 else 0.5 + (doc_id % 50) / 100.0
        record = {
            "document_info": {
                "document_type": "invoice",
                "currency": m_total.group(2) if m_total else None,
            },
            "invoice_details": {
                "invoice_number": m_no.group(1) if m_no else None,
                "invoice_date": m_date.group(1) if m_date else None,
            },
            "financial_totals": {
                "total_amount": float(m_total.group(1)) if m_total else None,
                "currency": m_total.group(2) if m_total else None,
            },
            "extraction_metadata": {
                "confidence_score": confidence,
                "fields_found": 4,
                "fields_empty": 0,
                "processing_notes": [],
            },
        }
        return json.dumps(record, sort_keys=True)


class OpenAICompatClient:
    """``chat/completions`` client for any OpenAI-compatible base URL —
    the reference's scaleway / mistral / ollama / custom providers all
    reduce to exactly this shape (ai-generator.ts:90-159:
    ``createOpenAI({baseURL, apiKey})``).

    Pure-stdlib (urllib) — never exercised against the real network in
    CI (this sandbox has none); request assembly and the retry taxonomy
    are unit-tested against a loopback stub server.  Retry taxonomy:
    429 and 5xx (and transport errors) retry with deterministic
    backoff up to ``max_attempts``; other 4xx fail fast — the same
    split the reference's SDK applies."""

    RETRYABLE = {429, 500, 502, 503, 504}

    def __init__(self, base_url: str | None = None, api_key: str | None = None,
                 model: str | None = None, *, timeout: float = 60.0,
                 max_attempts: int = 3, backoff_s: float = 0.5):
        import os

        self.base_url = (base_url or os.environ.get("EKRAY_LLM_BASE_URL", "")).rstrip("/")
        if not self.base_url:
            raise ValueError(
                "OpenAICompatClient needs a base URL (arg or EKRAY_LLM_BASE_URL)")
        self.api_key = api_key if api_key is not None else os.environ.get(
            "EKRAY_LLM_API_KEY", "")
        self.model = model or os.environ.get("EKRAY_LLM_MODEL", "default")
        self.timeout = timeout
        self.max_attempts = max_attempts
        self.backoff_s = backoff_s

    def build_request(self, prompt: str,
                      images: list[dict] | None = None) -> tuple[str, dict, bytes]:
        """(url, headers, body) for one chat completion — pure, so the
        assembly is testable without any transport."""
        content: object = prompt
        if images:
            content = [{"type": "text", "text": prompt}, *images]
        body = json.dumps(
            {
                "model": self.model,
                "messages": [{"role": "user", "content": content}],
                "temperature": 0,
            },
            sort_keys=True,
        ).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        return f"{self.base_url}/chat/completions", headers, body

    def generate(self, prompt: str, images: list[dict] | None = None) -> str:
        import time
        import urllib.error
        import urllib.request

        url, headers, body = self.build_request(prompt, images)
        last_err: Exception | None = None
        for attempt in range(1, self.max_attempts + 1):
            try:
                req = urllib.request.Request(url, data=body, headers=headers,
                                             method="POST")
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
                return payload["choices"][0]["message"]["content"]
            except urllib.error.HTTPError as exc:
                last_err = exc
                if exc.code not in self.RETRYABLE:
                    raise ValueError(
                        f"provider request failed ({exc.code}): "
                        f"{exc.read()[:200]!r}") from exc
            except (urllib.error.URLError, TimeoutError, OSError) as exc:
                last_err = exc
            if attempt < self.max_attempts:
                time.sleep(self.backoff_s * attempt)
        raise ValueError(f"provider unreachable after "
                         f"{self.max_attempts} attempts: {last_err}")


# public OpenAI-compatible endpoints of the reference's named providers
# (ai-provider.ts; ollama's default local port is its documented default)
_PROVIDER_BASE_URLS = {
    "scaleway": "https://api.scaleway.ai/v1",
    "mistral": "https://api.mistral.ai/v1",
    "ollama": "http://localhost:11434/v1",
    "custom": None,  # base_url must come from arg/env
}


def make_client(provider, seed: int = 1234, **kwargs):
    """Provider factory (ai-provider.ts role).

    ``provider`` is a registered name or a CALLABLE factory
    ``(seed) -> client`` — the custom-provider surface (U3, the
    reference's ``custom`` provider with a user-supplied base URL).  A
    callable travels to the actor via cloudpickle in
    ``fn_constructor_kwargs``, so registration needs no shared module
    state.  Named HTTP providers (scaleway/mistral/ollama/custom) build
    an :class:`OpenAICompatClient`; 'fake' is the deterministic
    in-sandbox model; unknown names fail loudly at stage build time."""
    if callable(provider):
        return provider(seed)
    if provider == "fake":
        return FakeLlmClient(seed)
    if provider in _PROVIDER_BASE_URLS:
        base = kwargs.pop("base_url", None) or _PROVIDER_BASE_URLS[provider]
        return OpenAICompatClient(base_url=base, **kwargs)
    raise ValueError(
        f"unknown provider {provider!r}: pass a callable factory or one "
        f"of the registered names ('fake', {', '.join(map(repr, _PROVIDER_BASE_URLS))})"
    )


# ---------------------------------------------------------------------------
# the actor-pool stage (V7 generate half)
# ---------------------------------------------------------------------------


class StructuredExtractor:
    """Actor: client + schema prepared once per actor; per-batch
    generate -> validate -> retry(<=max_retries) -> failure-as-data."""

    def __init__(self, *, target: pa.DataType = COMPREHENSIVE_INVOICE_TYPE,
                 provider: str = "fake", seed: int = 1234,
                 max_retries: int = 2, text_col: str = "text"):
        self.client = make_client(provider, seed)
        self.target = target
        self.max_retries = max_retries
        self.text_col = text_col

    def extract_one(self, text: str) -> tuple[dict | None, bool, int, list[str]]:
        prompt = build_prompt(self.target, text)
        errors: list[str] = []
        for attempt in range(1, self.max_retries + 2):
            raw = self.client.generate(prompt)
            normalized, ok, errs = validate_record(raw, self.target)
            if ok:
                return normalized, True, attempt, []
            errors = errs
            prompt = (
                prompt + "\n\nREPAIR: previous output failed validation: "
                + "; ".join(errs[:3])
            )
        return None, False, self.max_retries + 1, errors

    def __call__(self, batch: pa.Table) -> pa.Table:
        datas, valids, attempts, errors = [], [], [], []
        for text in batch[self.text_col].to_pylist():
            data, ok, n, errs = self.extract_one(text or "")
            datas.append(
                json.dumps(data, sort_keys=True, ensure_ascii=False)
                if data is not None else ""
            )
            valids.append(ok)
            attempts.append(n)
            errors.append(errs)
        return (
            batch.append_column("data", pa.array(datas, pa.large_string()))
            .append_column("valid", pa.array(valids, pa.bool_()))
            .append_column("n_attempts", pa.array(attempts, pa.int32()))
            .append_column("errors", pa.array(errors, pa.list_(pa.string())))
        )
