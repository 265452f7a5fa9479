"""Property-based tests (SURVEY §5 plan): span encode/decode round-trips,
decoder equivalences, metric symmetries — hypothesis-generated inputs."""

from hypothesis import given, settings, strategies as st

from ner_funtool_ray.functions.spans import (
    decode_bmes,
    decode_clue_spans,
    decode_positional,
    spans_to_clue_label,
)
from ner_funtool_ray.sources.clue_json import spans_to_bio
from ner_funtool_ray.sources.conll import parse_conll_text

TYPES = ["ORG", "LOC", "PER", "game"]


@st.composite
def planted_spans(draw):
    """Text + non-overlapping typed spans (inclusive ends)."""
    n = draw(st.integers(min_value=1, max_value=40))
    text = "".join(
        draw(st.lists(st.sampled_from("abcdefgh中国北京"), min_size=n, max_size=n))
    )
    spans = []
    pos = 0
    while pos < n:
        start = pos + draw(st.integers(min_value=0, max_value=3))
        if start >= n:
            break
        end = min(n - 1, start + draw(st.integers(min_value=0, max_value=4)))
        spans.append((start, end, draw(st.sampled_from(TYPES))))
        pos = end + 2  # at least one gap char so spans never touch-overlap
    return text, spans


@given(planted_spans())
@settings(max_examples=200, deadline=None)
def test_spans_to_bio_roundtrip_positional(case):
    """plant → BIO tags → decode_positional recovers exactly the planted
    spans (S- singletons excluded from decode_bmes-style decoders, so use
    decode_clue_spans which handles S-)."""
    text, spans = case
    label = {}
    for s, e, typ in spans:
        label.setdefault(typ, {}).setdefault(text[s : e + 1], []).append([s, e])
    tags = spans_to_bio(text, label)
    got_spans, got_types = decode_clue_spans(text, tags)
    got = {(s, e, t) for (s, e), t in zip(got_spans, got_types)}
    expect = {(s, e, t) for s, e, t in spans}
    assert got == expect


@given(planted_spans())
@settings(max_examples=200, deadline=None)
def test_multichar_spans_roundtrip_bmes_decoders(case):
    text, spans = case
    multi = [(s, e, t) for s, e, t in spans if e > s]  # B..E spans only
    label = {}
    for s, e, typ in multi:
        label.setdefault(typ, {}).setdefault(text[s : e + 1], []).append([s, e])
    tags = spans_to_bio(text, label)
    got_b = {(s, e, t) for t, _surf, s, e in decode_bmes(text, tags)}
    got_p = {(s, e, t) for t, _surf, s, e in decode_positional(text, tags)}
    expect = {(s, e, t) for s, e, t in multi}
    assert got_b == expect
    assert got_p == expect  # planted tags are type-consistent → identical


@given(st.lists(st.sampled_from(
    ["O", "B-ORG", "M-ORG", "E-ORG", "S-LOC", "B-LOC", "E-LOC", "X"]
), min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_decoder_outputs_always_wellformed(tags):
    text = "x" * len(tags)
    for typ, surface, s, e in decode_bmes(text, tags):
        assert 0 <= s <= e < len(tags)
        assert len(surface) >= 2  # B..E implies ≥2 chars... unless O-skips
    spans, types = decode_clue_spans(text, tags)
    for (s, e), t in zip(spans, types):
        assert 0 <= s <= e < len(tags)
    # On O-free streams the type-consistent decoder (calculate semantics)
    # emits a subset of the unconstrained one (get_entity semantics).  With
    # O present they intentionally differ: decode_positional SKIPS O
    # (id-variant, entity_evaluating.py:19) while decode_bmes RESETS on O
    # (string-variant, ner_utils.py:62-79) — both reference behaviors.
    if all(t != "O" for t in tags):
        assert set(decode_positional(text, tags)) <= set(decode_bmes(text, tags))


@given(st.lists(
    st.tuples(
        st.lists(st.sampled_from("abc中国"), min_size=1, max_size=8),
        st.sampled_from(["O", "B-ORG", "E-ORG"]),
    ),
    min_size=0, max_size=30,
))
@settings(max_examples=100, deadline=None)
def test_conll_write_parse_roundtrip(rows):
    # build CoNLL text from (chars, tag) rows split into sentences of ≤5
    lines = []
    sentences = []
    cur = []
    for i, (chars, tag) in enumerate(rows):
        ch = "".join(chars)
        cur.append((ch, tag))
        lines.append(f"{ch}\t{tag}")
        if len(cur) == 5:
            sentences.append(cur)
            cur = []
            lines.append("")
    if cur:
        sentences.append(cur)
    text = "\n".join(lines) + "\n"
    parsed = parse_conll_text(text)
    assert len(parsed) == len(sentences)
    for (chars, tags), expect in zip(parsed, sentences):
        assert chars == [c for c, _ in expect]
        assert tags == [t for _, t in expect]


@given(planted_spans())
@settings(max_examples=100, deadline=None)
def test_clue_label_assembly_roundtrip(case):
    text, spans = case
    sp = [[s, e] for s, e, _ in spans]
    ty = [t for _, _, t in spans]
    label = spans_to_clue_label(text, sp, ty)
    back = {
        (s, e, typ)
        for typ, words in label.items()
        for _w, offs in words.items()
        for s, e in offs
    }
    assert back == {(s, e, t) for s, e, t in spans}


# --- round-2 additions -----------------------------------------------------


@st.composite
def edge_lists(draw):
    n_nodes = draw(st.integers(min_value=2, max_value=40))
    n_edges = draw(st.integers(min_value=1, max_value=80))
    edges = [
        (
            draw(st.integers(min_value=0, max_value=n_nodes - 1)),
            draw(st.integers(min_value=0, max_value=n_nodes - 1)),
        )
        for _ in range(n_edges)
    ]
    return [(a, b) for a, b in edges if a != b]


@given(edge_lists())
@settings(max_examples=200, deadline=None)
def test_union_find_matches_bfs_components(edges):
    """clusters_from_pairs (the driver oracle for the distributed
    min-label propagation) must equal plain BFS connected components with
    min-node labels, on arbitrary multigraphs incl. duplicate/reversed
    edges."""
    import pandas as pd

    from ner_funtool_ray.stages.dedup import clusters_from_pairs

    if not edges:
        return
    got = clusters_from_pairs(
        pd.DataFrame({"a": [a for a, _ in edges], "b": [b for _, b in edges]})
    )
    # BFS reference
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, queue = [], [start]
        seen.add(start)
        while queue:
            x = queue.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    queue.append(y)
        label = min(comp)
        for x in comp:
            want[x] = label
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


@given(st.text(alphabet="ab cd\t\n中国x", max_size=120))
@settings(max_examples=200, deadline=None)
def test_winnow_whitespace_invariance(text):
    """Winnowing fingerprints are invariant to whitespace layout (the
    normalization contract shared with the SQL twin)."""
    from ner_funtool_ray.pipelines.textops import _WinnowStage

    st_ = _WinnowStage()
    a = st_._doc_fps(text)
    b = st_._doc_fps("  ".join(text.split()))
    assert a == b


@given(st.text(alphabet="abc def 中国", max_size=80))
@settings(max_examples=100, deadline=None)
def test_minhash_signature_deterministic_and_band_consistent(text):
    import numpy as np

    from ner_funtool_ray.functions.hashing import MinHasher, char_ngrams

    h1 = MinHasher(num_perm=32, seed=9)
    h2 = MinHasher(num_perm=32, seed=9)
    s1 = h1.signature(char_ngrams(text))
    s2 = h2.signature(char_ngrams(text))
    assert np.array_equal(s1, s2)
    assert h1.band_keys(s1, 8) == h2.band_keys(s2, 8)
    # universal-hash range: truncated to 32 bits
    assert (s1 <= 0xFFFFFFFF).all()
