"""Golden-text prompt parity (M5) and shipped-backend unit tests (M6/T1/T2).

The prompt goldens pin sha256 of every generated prompt; when the reference
tree is present the test also imports the reference's own builder and compares
byte-for-byte (prompt.py:16-144, prompt_factory.py:26-46).  Backend tests mock
the transports (client= / tokenizer=+model= / post=) — no openai/transformers/
network needed.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pytest

from knowledgegraph_ray.functions.prompts import (
    DEFAULT_ENTITY_TYPES,
    DataType,
    PromptFactory,
    get_email_system_prompt,
    get_entity_attribute_strings,
)
from knowledgegraph_ray.stages.backends import (
    OllamaHTTPBackend,
    OpenAIChatBackend,
    TransformerBackend,
)

REFERENCE = "/root/reference"


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


# Goldens extracted from the reference builder (see module docstring).
GOLDEN = {
    "entity_attributes": "82833077db93ac692dbbc1a7f8af65e4415ee1dee16fd5c552ec6e858a7708fc",
    "sys_email": "2bb5316e9c3e80d7ab4b6c30f7466444a034faf75c26978c9577a3cc76431882",
    "sys_doc": "70e3a1e8e8925b1cef7f7354f7ec985646d13493bfc9a183e6e072c65929f568",
    "ex_email": "cd15473cfc481f6eb05577cbef5e8506833a676f06f8b19e51d1885dc70f89a7",
    "ex_doc": "0910689e9cb1b9776d63aa6e529ecaf2e56788e07635bed4015b7f4006f1ff67",
}


def test_prompt_goldens():
    pf = PromptFactory()
    assert _sha(get_entity_attribute_strings()) == GOLDEN["entity_attributes"]
    sys_email = pf.get_system_prompt(DataType.EMAIL)
    assert len(sys_email) == 8468
    assert _sha(sys_email) == GOLDEN["sys_email"]
    # the single format pass folds the {{id}} escape (prompt.py:39)
    assert 'Issue {id}' in sys_email and "{{id}}" not in sys_email
    assert "{entity_attributes}" not in sys_email
    sys_doc = pf.get_system_prompt(DataType.DOCUMENT)
    assert len(sys_doc) == 1810
    assert _sha(sys_doc) == GOLDEN["sys_doc"]
    assert _sha(pf.create_extraction_prompt(DataType.EMAIL, "CTX")) == GOLDEN["ex_email"]
    assert _sha(pf.create_extraction_prompt(DataType.DOCUMENT, "CTX")) == GOLDEN["ex_doc"]


def test_prompt_formatting_fields():
    pf = PromptFactory()
    p = pf.create_extraction_prompt(
        DataType.EMAIL, "the body", entity_types=["Person", "Team"]
    )
    assert "Entity_types: Person, Team" in p
    assert "Email Text: the body" in p
    d = pf.create_extraction_prompt(DataType.DOCUMENT, "doc body")
    assert "Document Content: doc body" in d
    assert "Entity_types: " + ", ".join(DEFAULT_ENTITY_TYPES) in d
    # every configured type is advertised in the email system prompt
    attrs = get_entity_attribute_strings()
    for t in DEFAULT_ENTITY_TYPES:
        assert f"**{t}**: [" in attrs


def test_detect_data_type():
    pf = PromptFactory()
    assert pf.detect_data_type({"data_type": "DOCUMENT"}) is DataType.DOCUMENT
    assert pf.detect_data_type({"data_type": "email"}) is DataType.EMAIL
    assert pf.detect_data_type({"data_type": "bogus"}) is DataType.EMAIL
    assert pf.detect_data_type({"subject": "hi"}) is DataType.EMAIL
    assert pf.detect_data_type({}) is DataType.EMAIL


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference tree not present",
)
def test_prompts_match_reference_builder():
    """Byte parity against the reference's own prompt builder."""
    cwd = os.getcwd()
    sys.path.insert(0, os.path.join(REFERENCE, "src"))
    try:
        os.chdir(REFERENCE)  # entity_config.yaml resolves relative to cwd
        try:
            from workspace_kg.utils import prompt as ref_prompt
            from workspace_kg.utils.prompt_factory import (
                DataType as RefDataType,
                PromptFactory as RefFactory,
            )
        except Exception as exc:  # pragma: no cover
            pytest.skip(f"reference import failed: {exc}")
        finally:
            os.chdir(cwd)
        rf = RefFactory()
        pf = PromptFactory()
        assert get_entity_attribute_strings() == ref_prompt.get_entity_attribute_strings()
        assert pf.get_system_prompt(DataType.EMAIL) == rf.get_system_prompt(
            RefDataType.EMAIL
        )
        assert pf.get_system_prompt(DataType.DOCUMENT) == rf.get_system_prompt(
            RefDataType.DOCUMENT
        )
        for ctx in ("CTX", "multi\nline body", ""):
            assert pf.create_extraction_prompt(
                DataType.EMAIL, ctx
            ) == rf.create_extraction_prompt(RefDataType.EMAIL, ctx)
            assert pf.create_extraction_prompt(
                DataType.DOCUMENT, ctx
            ) == rf.create_extraction_prompt(RefDataType.DOCUMENT, ctx)
    finally:
        sys.path.remove(os.path.join(REFERENCE, "src"))


# ---------------------------------------------------------------------------
# OpenAIChatBackend
# ---------------------------------------------------------------------------


class _FakeChatClient:
    """Mimics openai.OpenAI just enough: client.chat.completions.create."""

    def __init__(self, reply: "str | Exception"):
        self.reply = reply
        self.calls: list[dict] = []
        outer = self

        class _Completions:
            def create(self, **kwargs):
                outer.calls.append(kwargs)
                if isinstance(outer.reply, Exception):
                    raise outer.reply

                class _Msg:
                    content = outer.reply

                class _Choice:
                    message = _Msg()

                class _Resp:
                    choices = [_Choice()]

                return _Resp()

        class _Chat:
            completions = _Completions()

        self.chat = _Chat()


def test_openai_backend_call_layout():
    client = _FakeChatClient('("entity"<|>"A"<|>"Person"<|>"name": "A")##')
    be = OpenAIChatBackend(client=client, model="test-model")
    out = be("some email text")
    assert out.startswith('("entity"')
    (call,) = client.calls
    assert call["model"] == "test-model"
    assert call["temperature"] == 0.2  # entity_extractor.py:36
    msgs = call["messages"]
    assert [m["role"] for m in msgs] == ["system", "user"]
    assert msgs[0]["content"] == PromptFactory().get_system_prompt(DataType.EMAIL)
    assert "Email Text: some email text" in msgs[1]["content"]
    assert "Entity_types: " + ", ".join(DEFAULT_ENTITY_TYPES) in msgs[1]["content"]


def test_openai_backend_error_returns_empty():
    be = OpenAIChatBackend(client=_FakeChatClient(RuntimeError("boom")))
    assert be("text") == ""  # entity_extractor.py:39-41


def test_openai_backend_env_model(monkeypatch):
    monkeypatch.setenv("LLM_MODEL_NAME", "env-model")
    be = OpenAIChatBackend(client=_FakeChatClient("x"), model="ignored")
    assert be.model == "env-model"


def test_openai_backend_feeds_triple_extractor():
    """End-to-end: the backend's raw text flows through the tuple parser."""
    from knowledgegraph_ray.stages.extract import TripleExtractor

    raw = (
        '("entity"<|>"Sarah Jones"<|>"Person"<|>"name": "Sarah Jones"<|>'
        '"email": "sarah@acme.com")##\n'
        '("relationship"<|>"Sarah Jones"<|>"Acme Inc"<|>"WORKS_AT"<|>'
        '"employee"<|>9)##\n<|COMPLETE|>'
    )
    ex = TripleExtractor(backend=OpenAIChatBackend(client=_FakeChatClient(raw)))
    batch = pa.table(
        {
            "url": ["u1"],
            "text": ["Sarah works at Acme."],
            "ord": pa.array([0], pa.int64()),
        }
    )
    out = ex(batch)
    assert out.column("entity_count").to_pylist() == [1]
    assert out.column("relationship_count").to_pylist() == [1]
    ent = out.column("entities").to_pylist()[0][0]
    assert ent["entity_name"] == "Sarah Jones"
    assert out.column("error").to_pylist() == [""]


# ---------------------------------------------------------------------------
# TransformerBackend
# ---------------------------------------------------------------------------


class _FakeTokenizer:
    """Deterministic whitespace tokenizer with padding + attention mask."""

    def __call__(self, texts, padding, truncation, return_tensors, max_length):
        toks = [t.split()[:max_length] or [""] for t in texts]
        width = max(len(t) for t in toks)
        ids, mask = [], []
        for t in toks:
            pad = width - len(t)
            ids.append([hash(w) % 97 for w in t] + [0] * pad)
            mask.append([1] * len(t) + [0] * pad)
        return {
            "input_ids": np.array(ids, np.int64),
            "attention_mask": np.array(mask, np.int64),
        }


class _FakeModel:
    """Embedding = one-hot-ish rows derived from token ids (dim 4)."""

    def __call__(self, input_ids, attention_mask):
        n, w = input_ids.shape
        emb = np.zeros((n, w, 4), np.float64)
        for i in range(n):
            for j in range(w):
                emb[i, j] = [input_ids[i, j] % 7, 1.0, j, input_ids[i, j] % 3]
        return (emb,)


def test_transformer_backend_mean_pooling():
    be = TransformerBackend(tokenizer=_FakeTokenizer(), model=_FakeModel())
    texts = ["a b c", "longer text with five tokens", "x"]
    out = be(texts)
    assert out.shape == (3, 4) and out.dtype == np.float32
    # manual masked mean for row 0 (3 real tokens of max width 5)
    tok = _FakeTokenizer()(texts, True, True, "pt", 512)
    emb = _FakeModel()(**tok)[0]
    m = tok["attention_mask"][0].astype(np.float64)
    expect = (emb[0] * m[:, None]).sum(0) / m.sum()
    np.testing.assert_allclose(out[0], expect.astype(np.float32), rtol=1e-6)
    # padding rows must NOT contribute: row 2 has width-1 real token
    m2 = tok["attention_mask"][2].astype(np.float64)
    expect2 = (emb[2] * m2[:, None]).sum(0) / m2.sum()
    np.testing.assert_allclose(out[2], expect2.astype(np.float32), rtol=1e-6)


def test_transformer_backend_plugs_into_embedder():
    from knowledgegraph_ray.stages.embedder import Embedder

    emb = Embedder(dim=4, backend=TransformerBackend(
        tokenizer=_FakeTokenizer(), model=_FakeModel()))
    batch = pa.table({
        "name": ["alice", "bob"],
        "type": ["Person", "Person"],
        "rawDescriptions": [["x"], ["y z"]],
    })
    out = emb(batch)
    vecs = out.column("embedding").to_pylist()
    assert len(vecs) == 2 and len(vecs[0]) == 4


# ---------------------------------------------------------------------------
# OllamaHTTPBackend
# ---------------------------------------------------------------------------


class _FakeResponse:
    def __init__(self, payload, status=200):
        self._payload = payload
        self.status = status

    def raise_for_status(self):
        if self.status != 200:
            raise RuntimeError(f"HTTP {self.status}")

    def json(self):
        return self._payload


def test_ollama_backend_ok_and_payload():
    calls = []

    def post(url, json=None, headers=None, timeout=None):
        calls.append((url, json, timeout))
        return _FakeResponse({"embedding": [1.0, 2.0, 3.0]})

    be = OllamaHTTPBackend(model_name="nomic", base_url="http://h:11434", post=post)
    out = be(["hello", "world"])
    np.testing.assert_array_equal(out, np.array([[1, 2, 3], [1, 2, 3]], np.float32))
    url, payload, timeout = calls[0]
    assert url == "http://h:11434/api/embeddings"  # ollama_embedder.py:10
    assert payload == {"model": "nomic", "prompt": "hello"}
    assert timeout == 30.0


def test_ollama_backend_partial_failure_zero_fills():
    def post(url, json=None, headers=None, timeout=None):
        if json["prompt"] == "bad":
            return _FakeResponse({}, status=500)
        return _FakeResponse({"embedding": [4.0, 5.0]})

    be = OllamaHTTPBackend(model_name="m", base_url="http://h", post=post)
    out = be(["ok", "bad", "ok"])
    np.testing.assert_array_equal(
        out, np.array([[4, 5], [0, 0], [4, 5]], np.float32)
    )
    # empty text short-circuits without a request (ollama_embedder.py:17-18)
    assert be.embed_text("") == []


def test_ollama_backend_all_failed_raises():
    be = OllamaHTTPBackend(
        model_name="m", base_url="http://h",
        post=lambda *a, **k: _FakeResponse({}, status=500),
    )
    with pytest.raises(RuntimeError, match="every call"):
        be(["a", "b"])


def test_lazy_backend_constructs_once_at_call_time():
    from knowledgegraph_ray.stages.backends import LazyBackend

    built = []

    class Fake:
        def __init__(self, tag="x"):
            built.append(tag)

        def __call__(self, xs):
            return [len(x) for x in xs]

    lb = LazyBackend(Fake, tag="t1")
    assert built == []  # nothing constructed at wrap time (driver side)
    assert lb(["ab", "c"]) == [2, 1]
    assert lb(["d"]) == [1]
    assert built == ["t1"]  # exactly one construction, at first call
