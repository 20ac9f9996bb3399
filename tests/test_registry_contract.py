"""Inventory-contract guardrails over the query registry.

The driver's correctness gate is only as strong as the registry it
samples: these checks pin the contract so a refactor cannot silently
drop an oracle, blank a note, or register a duplicate — and the
rows-only set stays the EXPLICIT, justified whitelist it is meant to
be (inherently approximate / sequential operators only).
"""

from __future__ import annotations

import re

from cdc_spark.queries import REGISTRY

# The only entries allowed to skip the DuckDB oracle, each for a
# documented structural reason (approximation or sequential fold).
ROWS_ONLY_WHITELIST = {
    "q31_approx_stats",          # HLL / approx-percentile sketches
    "dp01_sequence_packing",     # sequential next-fit fold
    "dp02_packing_efficiency",   # derived from dp01's fold
    # ss03/ss06 left this set in round 6: the deterministic
    # integer-quantized codebook made the IVF path hash-checkable
}


def test_every_query_has_note_and_tags():
    for name, spec in REGISTRY.items():
        assert spec.note and len(spec.note) >= 10, f"{name}: thin note"
        assert spec.tags, f"{name}: no tags"


def test_rows_only_set_is_exactly_the_whitelist():
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    assert rows_only == ROWS_ONLY_WHITELIST


def test_names_follow_family_convention():
    pat = re.compile(
        r"^(cdc|dd|dp|io|mm|pu|q|ss|st|tx)\d{2,3}_[a-z0-9_]+$"
    )
    for name in REGISTRY:
        assert pat.match(name), f"unconventional name: {name}"


def test_oracles_ground_in_registered_tables_or_literals():
    """Every oracle must read at least one driver-registered table or
    be a pure VALUES literal — an oracle that references nothing the
    driver registers would silently compare garbage."""
    known = (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    )
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        o = spec.oracle.lower()
        grounded = (
            any(re.search(rf"\b{t}\b", o) for t in known)
            or "values" in o
            or "from" not in o  # pure literal SELECT is self-grounding
            or "range(" in o    # generator oracles (io08/io10)
        )
        assert grounded, f"{name}: oracle grounded in nothing the driver registers"


def test_rotation_prefix_is_50_oracled_entries():
    """The driver samples a 50-row prefix of queries(): the prefix
    tier must hold EXACTLY 50 registered entries, every one carrying
    an oracle — a no-oracle entry there burns a gate slot on a
    guaranteed no_oracle row (the q31 lesson from round 6)."""
    import __spark_entry__ as entry

    prefix = entry.GATE_PREFIX
    assert len(prefix) == 50
    assert len(set(prefix)) == 50, "duplicate entries in prefix"
    for name in prefix:
        assert name in REGISTRY, f"{name} not registered"
        assert REGISTRY[name].oracle is not None, (
            f"{name} has no oracle — it would waste a driver slot"
        )
    ordered = list(entry.queries())
    assert ordered[:50] == list(prefix), "prefix is not first in queries()"


def test_next_rotation_tier_is_oracled_and_registered():
    """Entries staged for the NEXT round's rotation must already be
    registered with oracles, so the next prefix can be assembled by
    reordering alone."""
    import __spark_entry__ as entry

    nxt = entry.NEXT_TIER
    assert len(set(nxt)) == len(nxt)
    for name in nxt:
        assert name in REGISTRY, f"{name} not registered"
        assert REGISTRY[name].oracle is not None, f"{name}: no oracle"
