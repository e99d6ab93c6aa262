"""Structured-extraction stage (stages/llm_stage.py): prompt builder,
image message formatter, provider factory, retry/failure semantics."""

import json

import pyarrow as pa
import pytest

from extract_kit_ray.schemas import COMPREHENSIVE_INVOICE_TYPE
from extract_kit_ray.stages.llm_stage import (
    FakeLlmClient,
    StructuredExtractor,
    build_prompt,
    format_image_message,
    make_client,
)


def _invoice_text(doc_id: int) -> str:
    return (
        f"INVOICE\nInvoice No: INV-{doc_id:08d}\n"
        f"Date: 2024-{1 + doc_id % 12:02d}-{1 + doc_id % 28:02d}\n"
        f"Total: {doc_id % 9000 + 100}.{doc_id % 100:02d} EUR"
    )


def test_prompt_contains_schema_fields_and_document():
    prompt = build_prompt(COMPREHENSIVE_INVOICE_TYPE, "DOC BODY")
    assert "invoice_details.invoice_number" in prompt
    assert "financial_totals.total_amount" in prompt
    assert prompt.endswith("DOCUMENT:\nDOC BODY")


def test_image_message_data_url():
    msg = format_image_message(b"\x89PNG1234", "image/png")
    assert msg["type"] == "image_url"
    assert msg["image_url"]["url"].startswith("data:image/png;base64,")


def test_unknown_provider_fails_loudly():
    with pytest.raises(ValueError, match="unknown provider"):
        make_client("gpt-42")


def test_clean_doc_single_attempt():
    ex = StructuredExtractor()
    data, ok, attempts, errs = ex.extract_one(_invoice_text(1))
    assert ok and attempts == 1 and errs == []
    assert data["invoice_details"]["invoice_number"] == "INV-00000001"
    assert data["financial_totals"]["total_amount"] == pytest.approx(101.01)


def test_malformed_first_attempt_repairs_on_retry():
    ex = StructuredExtractor()
    # doc_id % 7 == 0 -> first generate returns truncated JSON
    raw1 = FakeLlmClient().generate(build_prompt(COMPREHENSIVE_INVOICE_TYPE,
                                                 _invoice_text(7)))
    with pytest.raises(json.JSONDecodeError):
        json.loads(raw1)
    data, ok, attempts, _ = ex.extract_one(_invoice_text(7))
    assert ok and attempts == 2
    assert data["invoice_details"]["invoice_number"] == "INV-00000007"


def test_persistent_schema_failure_is_data():
    ex = StructuredExtractor()
    # doc_id % 13 == 0 -> confidence_score 1.5 on every attempt
    data, ok, attempts, errs = ex.extract_one(_invoice_text(13))
    assert not ok and data is None
    assert attempts == 3  # 1 + max_retries
    assert any("confidence_score" in e for e in errs)


def test_batch_stage_schema(ray_session):
    import ray.data

    tbl = pa.table(
        {"doc_id": pa.array([1, 7, 13], pa.int64()),
         "text": pa.array([_invoice_text(i) for i in (1, 7, 13)], pa.string())}
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(StructuredExtractor, batch_format="pyarrow", concurrency=2)
        .take_all()
    )
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["valid"] and by_id[1]["n_attempts"] == 1
    assert by_id[7]["valid"] and by_id[7]["n_attempts"] == 2
    assert not by_id[13]["valid"] and by_id[13]["n_attempts"] == 3
    assert by_id[13]["data"] == "" and by_id[13]["errors"]


def test_custom_provider_callable():
    """U3 surface: a callable factory is a provider; the stage uses its
    client verbatim."""

    class EchoClient:
        def __init__(self, seed):
            self.seed = seed

        def generate(self, prompt):
            return json.dumps({
                "invoice_details": {"invoice_number": f"CUSTOM-{self.seed}"},
                "extraction_metadata": {"confidence_score": 0.9},
            })

    ex = StructuredExtractor(provider=lambda seed: EchoClient(seed), seed=42)
    data, ok, attempts, _ = ex.extract_one("whatever")
    assert ok and attempts == 1
    assert data["invoice_details"]["invoice_number"] == "CUSTOM-42"


# ---------------------------------------------------------------------------
# OpenAI-compatible HTTP provider (A2/U3 parity with ai-generator.ts)
# ---------------------------------------------------------------------------


def test_openai_compat_request_assembly():
    from extract_kit_ray.stages.llm_stage import OpenAICompatClient, format_image_message

    c = OpenAICompatClient("http://h.example/v1/", api_key="sk-test", model="m1")
    url, headers, body = c.build_request("hello")
    assert url == "http://h.example/v1/chat/completions"
    assert headers["Authorization"] == "Bearer sk-test"
    assert headers["Content-Type"] == "application/json"
    payload = json.loads(body)
    assert payload["model"] == "m1" and payload["temperature"] == 0
    assert payload["messages"] == [{"role": "user", "content": "hello"}]
    # vision message parts (M22) fold into a content array
    img = format_image_message(b"\x89PNG", "image/png")
    _, _, body2 = c.build_request("describe", images=[img])
    content = json.loads(body2)["messages"][0]["content"]
    assert content[0] == {"type": "text", "text": "describe"}
    assert content[1]["type"] == "image_url"
    assert content[1]["image_url"]["url"].startswith("data:image/png;base64,")


def test_openai_compat_env_config(monkeypatch):
    from extract_kit_ray.stages.llm_stage import OpenAICompatClient, make_client

    monkeypatch.setenv("EKRAY_LLM_BASE_URL", "http://env.example/v1")
    monkeypatch.setenv("EKRAY_LLM_API_KEY", "sk-env")
    monkeypatch.setenv("EKRAY_LLM_MODEL", "env-model")
    c = make_client("custom")
    assert isinstance(c, OpenAICompatClient)
    assert c.base_url == "http://env.example/v1"
    assert c.api_key == "sk-env" and c.model == "env-model"
    # named providers carry their public default base URLs
    assert make_client("ollama").base_url == "http://localhost:11434/v1"
    monkeypatch.delenv("EKRAY_LLM_BASE_URL")
    with pytest.raises(ValueError):
        OpenAICompatClient()


class _StubHandler:
    """Programmable loopback chat-completions server."""

    def __init__(self):
        self.requests = []
        self.script = []  # list of (status, body-dict-or-bytes)

    def make_server(self):
        import http.server
        import json as _json

        stub = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                stub.requests.append(
                    (self.path, dict(self.headers), self.rfile.read(n)))
                status, body = stub.script.pop(0)
                raw = (_json.dumps(body).encode()
                       if isinstance(body, dict) else body)
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def log_message(self, *a):
                pass

        return http.server.HTTPServer(("127.0.0.1", 0), H)


def _completion(text):
    return {"choices": [{"message": {"role": "assistant", "content": text}}]}


def test_openai_compat_roundtrip_and_retry_taxonomy():
    import threading

    from extract_kit_ray.stages.llm_stage import OpenAICompatClient

    stub = _StubHandler()
    srv = stub.make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}/v1"
        c = OpenAICompatClient(base, api_key="sk", model="m",
                               max_attempts=3, backoff_s=0.01)
        # happy path
        stub.script = [(200, _completion("ok!"))]
        assert c.generate("hi") == "ok!"
        path, headers, body = stub.requests[-1]
        assert path == "/v1/chat/completions"
        assert headers["Authorization"] == "Bearer sk"
        assert json.loads(body)["messages"][0]["content"] == "hi"
        # 500 then 200: retried
        stub.script = [(500, {"error": "boom"}), (200, _completion("second"))]
        assert c.generate("again") == "second"
        # 400: fail fast, single request
        stub.script = [(400, {"error": "bad request"})]
        n_before = len(stub.requests)
        with pytest.raises(ValueError, match="400"):
            c.generate("nope")
        assert len(stub.requests) == n_before + 1
        # exhaustion: three 503s -> ValueError
        stub.script = [(503, {}), (503, {}), (503, {})]
        with pytest.raises(ValueError, match="unreachable"):
            c.generate("down")
    finally:
        srv.shutdown()
