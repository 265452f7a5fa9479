"""Vectorized single-block MD5: bit parity with hashlib (and thereby with
DuckDB's md5_number_lower/upper, which the oracle recipes rely on)."""

import hashlib
import random
import string

import numpy as np

from ner_funtool_ray.functions.md5vec import (
    md5_number_lower_batch,
    md5_number_upper_batch,
    md5_planes,
    md5_unit_batch,
)


def test_parity_with_hashlib_short():
    random.seed(11)
    msgs = [
        "".join(random.choices(string.ascii_letters + string.digits + " :_",
                               k=random.randint(0, 55)))
        for _ in range(300)
    ] + ["", "a", "plane:42:0:0", str(2**63 + 7)]
    lo = md5_number_lower_batch(msgs)
    up = md5_number_upper_batch(msgs)
    for m, l_, u_ in zip(msgs, lo, up):
        d = hashlib.md5(m.encode()).digest()
        assert int(l_) == int.from_bytes(d[8:16], "little"), m
        assert int(u_) == int.from_bytes(d[:8], "little"), m


def test_long_message_fallback():
    msgs = ["x" * 56, "y" * 200]  # past the single-block limit
    lo = md5_number_lower_batch(msgs)
    for m, l_ in zip(msgs, lo):
        assert int(l_) == int.from_bytes(
            hashlib.md5(m.encode()).digest()[8:16], "little"
        )


def test_unit_values_in_range_and_deterministic():
    keys = [f"emb:abc:{i}" for i in range(64)]
    v1 = md5_unit_batch(keys)
    v2 = md5_unit_batch(keys)
    assert np.array_equal(v1, v2)
    assert (v1 >= -1.0).all() and (v1 < 1.0).all()
    assert len(np.unique(v1)) == 64  # no collisions on distinct keys


def test_planes_shape_and_determinism():
    p1 = md5_planes(6, 64, seed=42)
    p2 = md5_planes(6, 64, seed=42)
    p3 = md5_planes(6, 64, seed=7)
    assert p1.shape == (6, 64)
    assert np.array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
