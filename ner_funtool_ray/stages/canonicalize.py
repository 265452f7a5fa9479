"""P6 canonicalization: mention surfaces → canonical entity ids.

Two layers, mirroring SURVEY.md §7.1:

- :func:`canonicalize` — pure per-row normalization + alias-table rewrite
  (broadcast small side, no shuffle).  SQL-expressible → oracle-checked.
- :func:`alias_components` — union-find over alias *pairs* discovered by the
  linking stage: groupby(normalized key) is done with a Ray ``groupby``;
  the merge itself runs on the (small) distinct-surface table via min-label
  propagation until fixpoint — the pattern scales because it only ever
  touches distinct surfaces, not corpus rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ner_funtool_ray.config import ALIASES


def _canon_batch(batch: pa.Table, aliases: dict[str, str]) -> pa.Table:
    # fully vectorized: lower+trim, per-alias exact-match rewrite (alias
    # tables are small), 'ent:' prefix join — no per-row Python
    surf = pc.utf8_lower(pc.utf8_trim_whitespace(batch["surface"]))
    if isinstance(surf, pa.ChunkedArray):
        surf = surf.combine_chunks()
    canon = surf
    for alias, target in aliases.items():
        canon = pc.if_else(
            pc.equal(canon, alias), pa.scalar(target, type=pa.string()), canon
        )
    ent = pc.binary_join_element_wise(
        pa.array(["ent:"] * len(batch), type=pa.string()), canon, ""
    )
    return batch.append_column("canonical", canon).append_column("entity_id", ent)


def canonicalize(
    mentions: "ray.data.Dataset", aliases: dict[str, str] | None = None
) -> "ray.data.Dataset":
    """mentions → + (canonical, entity_id).  entity_id = 'ent:'+canonical."""
    aliases = dict(ALIASES) if aliases is None else aliases
    return mentions.map_batches(
        _canon_batch,
        fn_kwargs={"aliases": aliases},
        batch_format="pyarrow",
    )


def alias_components(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over alias pairs → surface → component-min canonical.

    Driver-side merge: the input is the *distinct* alias-pair table (small
    by construction — it comes out of a groupby over surfaces, not rows).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller string wins as the root
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {x: find(x) for x in parent}
