"""Serving surface: named-actor server parity with predict_interactive,
idempotent start, health, bert-model variant, Serve gate."""

import pytest

from ner_funtool_ray.pipelines.tagging import predict_interactive
from ner_funtool_ray.serving import predict, start_server, stop_server


def test_server_matches_interactive_path():
    texts = ["中国首都是北京", "spark joins the customer table", ""]
    server = start_server(name="t-ner", model="bilstm")
    try:
        got = predict(server, texts)
        want = predict_interactive(texts, model="bilstm")
        assert [r["text"] for r in got] == texts
        for row, spans in zip(got, want):
            assert [
                (e["type"], e["surface"]) for e in row["entities"]
            ] == [(t, s) for t, s, _s, _e in spans]
    finally:
        stop_server("t-ner")


def test_server_idempotent_and_healthy():
    import ray

    s1 = start_server(name="t-ner2")
    try:
        s2 = start_server(name="t-ner2")  # same named actor
        assert ray.get(s1.health.remote()) == "ok"
        assert ray.get(s2.health.remote()) == "ok"
        assert s1._actor_id == s2._actor_id
    finally:
        stop_server("t-ner2")


def test_server_bert_model():
    server = start_server(name="t-ner-bert", model="bert")
    try:
        out = predict(server, ["spark joins the table"])
        assert out[0]["text"] == "spark joins the table"
        assert isinstance(out[0]["entities"], list)
    finally:
        stop_server("t-ner-bert")


def test_http_server_end_to_end():
    """Real network request: POST a sentence over HTTP, assert the span
    JSON matches the in-process interactive path (the reference's
    infer_online request/response role, no starlette needed)."""
    import json
    import urllib.request

    from ner_funtool_ray.serving import start_http_server, stop_http_server

    httpd, _thread = start_http_server(name="t-ner-http", model="bilstm")
    try:
        host, port = httpd.server_address[:2]
        base = f"http://{host}:{port}"
        # health
        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            assert json.loads(r.read()) == {"status": "ok"}
        # predict
        texts = ["中国首都是北京", "spark joins the customer table"]
        req = urllib.request.Request(
            base,
            data=json.dumps({"texts": texts}).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            got = json.loads(r.read())
        assert [row["text"] for row in got] == texts
        want = predict_interactive(texts, model="bilstm")
        for row, spans in zip(got, want):
            assert [(e["type"], e["surface"]) for e in row["entities"]] == [
                (t, s) for t, s, _s, _e in spans
            ]
            for e in row["entities"]:
                assert set(e) == {"type", "surface", "start", "end"}
        # malformed body → 400, not a crash
        bad = urllib.request.Request(
            base, data=b'{"nope": 1}', method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as exc:
            assert exc.code == 400
    finally:
        stop_http_server(httpd, name="t-ner-http")


def test_serve_deployment_gated():
    from ner_funtool_ray.serving import build_serve_deployment

    try:
        import starlette  # noqa: F401

        has_serve_deps = True
    except ImportError:
        has_serve_deps = False
    if has_serve_deps:
        assert build_serve_deployment() is not None
    else:
        with pytest.raises(ImportError):
            build_serve_deployment()


def test_http_tfserving_rest_compat():
    """TF-Serving REST twin routes: model-status GET and :predict POST
    with both string and {"text": ...} instances must answer in the
    standard TF-Serving document shapes."""
    import json
    import urllib.request

    from ner_funtool_ray.serving import start_http_server, stop_http_server

    httpd, _thread = start_http_server(name="t-ner-tfs", model="bilstm")
    try:
        host, port = httpd.server_address[:2]
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(
            f"{base}/v1/models/t-ner-tfs", timeout=30
        ) as r:
            status = json.loads(r.read())
        assert status["model_version_status"][0]["state"] == "AVAILABLE"
        texts = ["中国首都是北京", "beijing hosts the summit"]
        for instances in (texts, [{"text": t} for t in texts]):
            req = urllib.request.Request(
                f"{base}/v1/models/t-ner-tfs:predict",
                data=json.dumps({"instances": instances}).encode("utf-8"),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                got = json.loads(r.read())
            assert list(got) == ["predictions"]
            assert [row["text"] for row in got["predictions"]] == texts
        # the plain POST / surface still answers alongside the alias
        req = urllib.request.Request(
            base,
            data=json.dumps({"texts": texts}).encode("utf-8"),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            plain = json.loads(r.read())
        assert [row["text"] for row in plain] == texts
    finally:
        stop_http_server(httpd, name="t-ner-tfs")
