"""Shipped real-model backends (M6/T1/T2), import-guarded.

The engine's hermetic defaults (RuleBasedBackend extraction, hash embeddings)
are unchanged; these classes are the opt-in production backends a user turns
on by passing ``backend=``:

* ``OpenAIChatBackend``  — the reference's LLM extraction call
  (entity_extractor.py:12-41): an OpenAI-compatible chat completion at
  temperature 0.2 whose raw text output feeds the tuple-grammar parser.
  Plugs into ``TripleExtractor(backend=OpenAIChatBackend(...))``.
* ``TransformerBackend`` — the reference's warm-model embedder
  (embedder.py:6-26,78-82): AutoTokenizer + AutoModel loaded once in
  ``__init__`` (per actor), mean pooling over the attention mask.
  Plugs into ``Embedder(backend=TransformerBackend(...))``.
* ``OllamaHTTPBackend``  — the reference's HTTP embedder
  (ollama_embedder.py:6-51): POST ``{model, prompt}`` to
  ``{base}/api/embeddings`` per text.

All heavy state (client, tokenizer, model, prompt text) is resolved at
construction time so an actor pool pays it once per actor, never per batch.
Transports are injectable (``client=`` / ``tokenizer=``+``model=`` /
``post=``) so unit tests mock them without the optional libraries; the real
libraries (openai / transformers / requests) are imported lazily inside
``__init__`` and raise a clear ImportError when absent.
"""

from __future__ import annotations

import os
from contextlib import nullcontext
from typing import Any, Callable, Iterable

import numpy as np

from ..functions.prompts import (
    DEFAULT_ENTITY_TYPES,
    DataType,
    PromptFactory,
)


class OpenAIChatBackend:
    """Chat-completion extraction backend (entity_extractor.py:12-41).

    ``__call__(text) -> str`` returns the raw model output in the tuple
    grammar (the ``TripleExtractor`` backend contract).  Per the reference,
    a transport error yields ``""`` (entity_extractor.py:39-41), which the
    extractor records as an error row rather than crashing the wave.  The
    reference fans out with asyncio.gather at PARALLEL_LLM_CALLS; here the
    Ray actor pool supplies that parallelism, so the per-call path is
    synchronous.
    """

    def __init__(
        self,
        model: str = "gemini-2.5-flash",
        data_type: DataType = DataType.EMAIL,
        entity_types: "list[str] | None" = None,
        temperature: float = 0.2,
        client: Any = None,
    ) -> None:
        if client is None:
            try:
                import openai
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "OpenAIChatBackend needs the `openai` package (or pass "
                    "client=); the hermetic default backend is "
                    "extract.RuleBasedBackend"
                ) from e
            client = openai.OpenAI(
                api_key=os.getenv("OPENAI_API_KEY"),
                base_url=os.getenv("OPENAI_API_BASE_URL"),
            )
        self.client = client
        self.model = os.getenv("LLM_MODEL_NAME", model)
        self.temperature = float(temperature)
        factory = PromptFactory()
        self._system_prompt = factory.get_system_prompt(data_type)
        self._extraction_template = factory.get_extraction_template(data_type)
        self._entity_types = ", ".join(entity_types or DEFAULT_ENTITY_TYPES)

    def messages_for(self, text: str) -> list[dict[str, str]]:
        """The exact two-message layout of entity_extractor.py:74-83."""
        user = self._extraction_template.format(
            entity_types=self._entity_types, context=text
        )
        return [
            {"role": "system", "content": self._system_prompt},
            {"role": "user", "content": user},
        ]

    def __call__(self, text: str) -> str:
        try:
            response = self.client.chat.completions.create(
                model=self.model,
                messages=self.messages_for(text),
                temperature=self.temperature,
            )
            return response.choices[0].message.content or ""
        except Exception:
            return ""


def _to_numpy(x: Any) -> np.ndarray:
    """Torch tensor or array-like → ndarray without importing torch."""
    detach = getattr(x, "detach", None)
    if detach is not None:
        x = detach()
        cpu = getattr(x, "cpu", None)
        if cpu is not None:
            x = cpu()
        numpy = getattr(x, "numpy", None)
        if numpy is not None:
            return numpy()
    return np.asarray(x)


class TransformerBackend:
    """Warm transformer embedder (embedder.py:6-26).

    ``__call__(texts) -> (n, dim) float32`` — the ``Embedder`` backend
    contract.  Tokenizer and model load once in ``__init__`` from
    ``model_name`` (default ``$EMBEDDING_MODEL``, embedder.py:8); encoding is
    padded/truncated at 512 tokens (embedder.py:20) and pooled with the
    reference's masked mean (embedder.py:78-82), computed here in numpy so
    the pooling is framework-agnostic (tests inject array-returning fakes).
    """

    def __init__(
        self,
        model_name: "str | None" = None,
        max_length: int = 512,
        tokenizer: Any = None,
        model: Any = None,
    ) -> None:
        if tokenizer is None or model is None:
            try:
                from transformers import AutoModel, AutoTokenizer
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "TransformerBackend needs the `transformers` package (or "
                    "pass tokenizer= and model=); the hermetic default is the "
                    "embedder's hash backend"
                ) from e
            name = model_name or os.getenv("EMBEDDING_MODEL")
            tokenizer = AutoTokenizer.from_pretrained(name)
            model = AutoModel.from_pretrained(name)
        self.tokenizer = tokenizer
        self.model = model
        self.max_length = int(max_length)
        try:  # inference guard when torch is present (embedder.py:21)
            import torch

            self._no_grad: Callable[[], Any] = torch.no_grad
        except ImportError:
            self._no_grad = nullcontext

    def __call__(self, texts: Iterable[str]) -> np.ndarray:
        texts = ["" if t is None else str(t) for t in texts]
        encoded = self.tokenizer(
            texts,
            padding=True,
            truncation=True,
            return_tensors="pt",
            max_length=self.max_length,
        )
        with self._no_grad():
            model_output = self.model(**encoded)
        token_embeddings = _to_numpy(model_output[0]).astype(np.float64)
        mask = _to_numpy(encoded["attention_mask"]).astype(np.float64)
        mask = mask[:, :, None]
        pooled = (token_embeddings * mask).sum(axis=1) / np.clip(
            mask.sum(axis=1), 1e-9, None
        )
        return pooled.astype(np.float32)


class OllamaHTTPBackend:
    """HTTP embedder (ollama_embedder.py:6-51).

    Per-text POST to ``{base}/api/embeddings``; a failed or malformed
    response yields ``[]`` for that text (reference :43-51), which the batch
    assembly maps to a zero vector so one flaky call cannot poison a whole
    Arrow block.  If EVERY text in a batch fails the dimension is unknowable
    and the batch raises — silence there would write an all-zeros embedding
    column with no signal.
    """

    def __init__(
        self,
        model_name: "str | None" = None,
        base_url: "str | None" = None,
        timeout: float = 30.0,
        post: "Callable[..., Any] | None" = None,
    ) -> None:
        if post is None:
            try:
                import requests
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "OllamaHTTPBackend needs the `requests` package (or pass "
                    "post=)"
                ) from e
            post = requests.post
        self._post = post
        self.model_name = model_name or os.getenv("OLLAMA_EMBEDDING_MODEL")
        base = base_url or os.getenv("OLLAMA_BASE_URL") or ""
        self.api_endpoint = f"{base}/api/embeddings"
        self.timeout = float(timeout)

    def embed_text(self, text: str) -> list[float]:
        """Reference per-text semantics (ollama_embedder.py:12-51)."""
        if not text or not isinstance(text, str):
            return []
        try:
            response = self._post(
                self.api_endpoint,
                json={"model": self.model_name, "prompt": text},
                headers={"Content-Type": "application/json"},
                timeout=self.timeout,
            )
            response.raise_for_status()
            result = response.json()
            return list(result.get("embedding") or [])
        except Exception:
            return []

    def __call__(self, texts: Iterable[str]) -> np.ndarray:
        vecs = [self.embed_text(t) for t in texts]
        dim = next((len(v) for v in vecs if v), 0)
        if dim == 0:
            raise RuntimeError(
                f"OllamaHTTPBackend: every call to {self.api_endpoint} in "
                f"this batch of {len(vecs)} failed or returned no embedding"
            )
        return np.array(
            [v if len(v) == dim else [0.0] * dim for v in vecs], np.float32
        )

    def test_connection(self) -> bool:
        """ollama_embedder.py:103-113."""
        try:
            return len(self.embed_text("test")) > 0
        except Exception:
            return False


class LazyBackend:
    """Defer heavy backend construction into the ACTOR (``__call__`` site).

    Passing a constructed ``TransformerBackend`` through
    ``fn_constructor_kwargs`` would load the model on the DRIVER and ship
    the pickled weights to every actor; wrapping the class in LazyBackend
    ships only the class reference + kwargs, and each actor constructs its
    own instance on first use — the warm-model-per-actor contract."""

    def __init__(self, factory: Any, **kwargs: Any) -> None:
        self.factory = factory
        self.kwargs = kwargs
        self._backend: Any = None

    def __call__(self, *args: Any, **kw: Any) -> Any:
        if self._backend is None:
            self._backend = self.factory(**self.kwargs)
        return self._backend(*args, **kw)
