"""Online-serving surface (SURVEY §2.4 T6 — `infer_online.py:242-309`).

The reference serves one sentence at a time over a TF-Serving gRPC stub
(request proto → predict → ``get_entity_result`` span decode).  The Ray
native mapping is a long-lived NAMED ACTOR holding tokenizer + model
(loaded once, like ``InferenceBase.__init__``, `infer_online.py:80-102`)
and answering span-decode requests via actor handle calls — the same
request/response semantics without the RPC proto hop:

    server = start_server(model="bilstm")
    out = predict(server, ["中国首都是北京"])
    # → [{"text": ..., "entities": [{"type", "surface", "start", "end"}]}]

``ray.serve`` would be the HTTP-facing deployment of the same callable;
its proxy dependencies (starlette/uvicorn) are not installed in this
sandbox, so :func:`build_serve_deployment` is gated behind an import-try
and returns the decorated deployment when Serve is available.

Batched/offline serving uses the actor-pool ``tag_sentences`` stage
instead; this module is the low-latency single-request path (measured
≈1 ms/sentence vs the reference's 22 ms, `Result.MD:8`).
"""

from __future__ import annotations

from typing import Any

import ray


def _spans_for_texts(tagger, texts: list[str]) -> list[dict[str, Any]]:
    """Shared request handler: texts → per-text entity spans (the
    ``get_entity_result`` response shape, `infer_online.py:271-309`)."""
    import pyarrow as pa

    from ner_funtool_ray.functions.spans import decode_bmes
    from ner_funtool_ray.functions.text import split_sentences

    results = []
    for text in texts:
        sents = split_sentences(text) or [""]
        out = tagger(pa.table({"sentence": sents}))
        entities = []
        offset = 0
        for sent, tags in zip(sents, out["pred_tags"].to_pylist()):
            for typ, surf, s, e in decode_bmes(sent, tags):
                entities.append(
                    {
                        "type": typ,
                        "surface": surf,
                        "start": offset + s,
                        "end": offset + e,
                    }
                )
            offset += len(sent)
        results.append({"text": text, "entities": entities})
    return results


class _NerServer:
    """Actor body: model pinned once per server (T6/T7 pattern)."""

    def __init__(self, model: str = "bilstm", cascade: bool = False,
                 weights_path: str | None = None, max_seq_len: int = 128,
                 bundle: str | None = None):
        if bundle is not None:
            # K7 exported-bundle load (`export.py`): signature picks the
            # class, sha-checked weights.npz supplies the tensors — the
            # from_saved_model serving role (`infer_offline.py:76-77`)
            from ner_funtool_ray.model.export import load_bundle

            self.tagger = load_bundle(bundle)
            return
        from ner_funtool_ray.stages.tag import _TAGGER_CLASSES

        self.tagger = _TAGGER_CLASSES[(model, cascade)](
            weights_path=weights_path, max_seq_len=max_seq_len
        )

    def predict(self, texts: list[str]) -> list[dict[str, Any]]:
        return _spans_for_texts(self.tagger, texts)

    def health(self) -> str:
        return "ok"


NerServerActor = ray.remote(num_cpus=1)(_NerServer)


def start_server(
    name: str = "ner-server",
    model: str = "bilstm",
    cascade: bool = False,
    weights_path: str | None = None,
    bundle: str | None = None,
) -> "ray.actor.ActorHandle":
    """Start (or connect to) the named serving actor.  ``get_if_exists``
    makes this idempotent across clients — one model instance per name,
    like one TF-Serving deployment per endpoint.  ``bundle`` serves an
    exported K7 bundle directory instead of a (model, cascade) family."""
    return NerServerActor.options(name=name, get_if_exists=True).remote(
        model=model, cascade=cascade, weights_path=weights_path,
        bundle=bundle,
    )


def predict(server: "ray.actor.ActorHandle", texts: list[str]) -> list[dict]:
    """Blocking request against a serving actor handle."""
    return ray.get(server.predict.remote(texts))


def stop_server(name: str = "ner-server") -> None:
    try:
        ray.kill(ray.get_actor(name))
    except ValueError:
        pass  # not running


def start_http_server(
    host: str = "127.0.0.1",
    port: int = 0,
    name: str = "ner-server-http",
    model: str = "bilstm",
    cascade: bool = False,
    weights_path: str | None = None,
):
    """Stdlib HTTP front door over the named serving actor — the
    network-facing role of the reference's TF-Serving endpoint
    (`infer_online.py:242-261`) with no starlette/uvicorn dependency:

    - ``POST /`` with ``{"texts": [...]}`` → the span-JSON response of
      :func:`predict` (one ``{"text", "entities"}`` row per input);
    - ``GET /health`` → ``{"status": "ok"}``;
    - TF-Serving REST compatibility (the public REST twin of the gRPC
      surface `infer_online.py:242-261` speaks, so a reference client
      can switch transports without reshaping payloads):
      ``POST /v1/models/<name>:predict`` with ``{"instances": [...]}``
      (plain strings or ``{"text": ...}`` objects) →
      ``{"predictions": [...]}``, and ``GET /v1/models/<name>`` →
      the standard ``model_version_status`` document.  Span decode
      happens server-side (the reference decodes the raw tag matrix
      client-side via ``get_entity_result`` — documented deviation).

    The handler thread holds only the actor HANDLE; all model state
    lives in the named actor, so many HTTP front doors can share one
    model instance (the TF-Serving topology).  ``port=0`` binds an
    ephemeral port — read it from the returned server's
    ``server_address``.  Returns ``(httpd, thread)``; call
    ``httpd.shutdown()`` (and :func:`stop_server` on ``name``) to stop."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    handle = start_server(
        name=name, model=model, cascade=cascade, weights_path=weights_path
    )

    class _Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj) -> None:
            payload = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
            if self.path.rstrip("/") in ("", "/health".rstrip("/")):
                self._reply(200, {"status": ray.get(handle.health.remote())})
            elif self.path.rstrip("/") == f"/v1/models/{name}":
                # TF-Serving model-status document (GET ModelStatus)
                ok = ray.get(handle.health.remote()) == "ok"
                self._reply(
                    200,
                    {
                        "model_version_status": [
                            {
                                "version": "1",
                                "state": "AVAILABLE" if ok else "LOADING",
                                "status": {
                                    "error_code": "OK",
                                    "error_message": "",
                                },
                            }
                        ]
                    },
                )
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == f"/v1/models/{name}:predict":
                    # TF-Serving REST predict: instances are plain
                    # strings or {"text": ...} rows
                    inst = body["instances"]
                    if not isinstance(inst, list):
                        raise TypeError("instances must be a list")
                    texts = [
                        i["text"] if isinstance(i, dict) else i
                        for i in inst
                    ]
                    self._reply(
                        200, {"predictions": predict(handle, texts)}
                    )
                    return
                texts = body["texts"]
                if not isinstance(texts, list):
                    raise TypeError("texts must be a list")
            except Exception as exc:
                self._reply(400, {"error": str(exc)})
                return
            self._reply(200, predict(handle, texts))

        def log_message(self, *args):  # silence per-request stderr lines
            pass

    httpd = ThreadingHTTPServer((host, port), _Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd, thread


def stop_http_server(httpd, name: str = "ner-server-http") -> None:
    httpd.shutdown()
    httpd.server_close()
    stop_server(name)


def build_serve_deployment(model: str = "bilstm", cascade: bool = False):
    """Ray Serve HTTP deployment of the same handler — available only when
    the Serve proxy deps (starlette/uvicorn) are installed; this sandbox
    ships ray[data] without them, so callers must handle ImportError."""
    from ray import serve  # raises ImportError without starlette

    @serve.deployment(num_replicas=2, ray_actor_options={"num_cpus": 1})
    class NerDeployment:
        def __init__(self) -> None:
            from ner_funtool_ray.stages.tag import _TAGGER_CLASSES

            self.tagger = _TAGGER_CLASSES[(model, cascade)]()

        async def __call__(self, request) -> list[dict]:
            body = await request.json()
            return _spans_for_texts(self.tagger, body["texts"])

    return NerDeployment
