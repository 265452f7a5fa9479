"""Serving-path convenience API (predict_interactive) smoke + determinism."""

from ner_funtool_ray.pipelines.tagging import predict_interactive


def test_predict_interactive_shapes_and_determinism():
    texts = ["中国首都是北京。张三在清华大学工作。", "", "hello world."]
    r1 = predict_interactive(texts)
    r2 = predict_interactive(texts)
    assert len(r1) == 3
    assert r1 == r2  # deterministic model
    for spans in r1:
        for typ, surface, s, e in spans:
            assert isinstance(typ, str) and isinstance(surface, str)
            assert 0 <= s <= e
