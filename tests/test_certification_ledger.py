"""Gate: no query may ride stale driver evidence (VERDICT r3 #2).

The driver certifies only the first 50 registered queries per round. Any
query outside that window must be byte-equivalent (fn source + oracle,
whitespace-insensitive) to the version last certified green by a driver
round, as recorded in certification_manifest.json. Changing an
out-of-window query without moving it into the window fails here, not in
the next round's verdict.
"""

from __future__ import annotations

from tests.certification import (
    DRIVER_WINDOW,
    current_hashes,
    load_manifest,
    registration_order,
    stale_out_of_window,
)


def test_no_stale_evidence_outside_driver_window():
    bad = stale_out_of_window()
    assert not bad, (
        f"queries changed (or never certified) but OUTSIDE the driver's "
        f"first-{DRIVER_WINDOW} window — their old driver evidence is stale: "
        f"{bad}. Move them into the first {DRIVER_WINDOW} registered (displace "
        f"only unchanged, previously-green queries), or revert the change, "
        f"then regenerate via `python tests/certification.py update` after "
        f"the next driver round."
    )


def test_manifest_covers_registry():
    """Every registered query is either certified or inside the window;
    manifest has no entries for queries that left the registry."""
    manifest = load_manifest()
    order = registration_order()
    names = set(order)
    dangling = sorted(set(manifest) - names)
    assert not dangling, f"manifest entries for unregistered queries: {dangling}"
    uncertified = [n for n in order if n not in manifest]
    in_window = set(order[:DRIVER_WINDOW])
    missing = [n for n in uncertified if n not in in_window]
    assert not missing, (
        f"queries with NO driver evidence outside the window: {missing}"
    )


def test_hashes_are_stable_across_import():
    h1 = current_hashes()
    h2 = current_hashes()
    assert h1 == h2
