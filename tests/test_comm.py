"""HLO collective-payload parser (parallel/comm.py) unit tests — the
absolute byte counts feed BASELINE.md's scaling predictions, so the parser
edge cases the r2 advisor flagged get pinned here."""

from openkeonspark_tpu.parallel.comm import (hlo_collective_bytes,
                                             wire_bytes_estimate)


def test_tuple_result_with_index_comments():
    """≥6-element tuple results embed /*index=5*/ comments whose '=' broke
    the lazy shape matcher — every tuple element must be counted."""
    hlo = """
ENTRY %main (p0: f32[8,48,64]) -> f32[8,48,64] {
  %a2a = (f32[1,48,64]{2,1,0}, f32[1,48,64]{2,1,0}, f32[1,48,64]{2,1,0}, f32[1,48,64]{2,1,0}, f32[1,48,64]{2,1,0}, /*index=5*/f32[1,48,64]{2,1,0}, f32[1,48,64]{2,1,0}, f32[1,48,64]{2,1,0}) all-to-all(%p), replica_groups={{0,1,2,3,4,5,6,7}}
}
"""
    out = hlo_collective_bytes(hlo)
    assert out["all-to-all"] == 8 * 48 * 64 * 4
    # wire: all-to-all moves (g-1)/g of the payload
    assert out["wire"] == int(8 * 48 * 64 * 4 * 7 / 8)


def test_async_start_counts_result_only():
    """-start ops return (operand, result, ctx...) tuples; only the result
    (the largest component) is the payload — summing double-counts."""
    hlo = """
ENTRY %main (p0: f32[128]) -> f32[512] {
  %ag = (f32[128]{0}, f32[512]{0}) all-gather-start(%p0), replica_groups={{0,1,2,3}}
  %agd = f32[512]{0} all-gather-done(%ag)
}
"""
    out = hlo_collective_bytes(hlo)
    assert out["all-gather"] == 512 * 4  # result only, -done skipped


def test_tuple_param_computation_header_not_dropped():
    """Computations whose headers contain tuple-typed params must still be
    split and scanned (the old [^)]* matcher failed on nested parens)."""
    hlo = """
%helper.1 ((f32[64]{0}, s32[8]{0}) tup.0: (f32[64], s32[8])) -> f32[64] {
  %ar = f32[64]{0} all-reduce(%x), replica_groups={{0,1}}, to_apply=%add
}
ENTRY %main (p0: f32[64]) -> f32[64] {
  %c = f32[64]{0} call(%p0), to_apply=%helper.1
}
"""
    out = hlo_collective_bytes(hlo)
    assert out["all-reduce"] == 64 * 4


def test_cond_branches_skipped():
    """Collectives reachable only via conditional branches (the exchange
    step's overflow fallbacks) are excluded from the steady-state count."""
    hlo = """
%fallback.7 (x: f32[1024]) -> f32[1024] {
  %big = f32[1024]{0} all-gather(%x), replica_groups={{0,1}}
}
%fast.3 (x: f32[1024]) -> f32[1024] {
  %z = f32[1024]{0} copy(%x)
}
ENTRY %main (p: f32[1024], c: pred[]) -> f32[1024] {
  %cond = f32[1024]{0} conditional(%c, %p, %p), true_computation=%fallback.7, false_computation=%fast.3
  %ar = f32[8]{0} all-reduce(%q), replica_groups={{0,1}}, to_apply=%add
}
"""
    out = hlo_collective_bytes(hlo)
    assert out["all-gather"] == 0          # fallback branch excluded
    assert out["all-reduce"] == 8 * 4      # steady-state op counted
    nofilter = hlo_collective_bytes(hlo, skip_cond_branches=False)
    assert nofilter["all-gather"] == 1024 * 4


def test_iota_replica_groups_and_size1_groups():
    hlo = """
ENTRY %main (p: f32[64]) -> f32[64] {
  %a = f32[64]{0} all-reduce(%p), replica_groups=[2,4]<=[8], to_apply=%add
  %b = f32[64]{0} all-reduce(%p), replica_groups={{0},{1}}, to_apply=%add
}
"""
    out = hlo_collective_bytes(hlo)
    assert out["all-reduce"] == 2 * 64 * 4
    # wire: group of 4 → 2·(3/4)·payload; size-1 groups move nothing
    assert out["wire"] == int(2 * (3 / 4) * 64 * 4)
    assert wire_bytes_estimate(out, 8) == out["wire"]


def test_unparseable_iota_groups_degrade_gracefully():
    """r4 advisor: an iota replica-group variant that passes the outer
    pattern but not the inner parse must degrade to the no-annotation
    estimate (None), not crash the byte accounting."""
    from openkeonspark_tpu.parallel.comm import _parse_groups
    assert _parse_groups("replica_groups=[2,4]<=[8]") is not None
    # malformed inner form (empty dims) -> graceful None
    assert _parse_groups("x replica_groups={{0,1},{2,3}} y") == \
        [[0, 1], [2, 3]]
    assert _parse_groups("no groups here") is None


def test_all_gather_dcn_share_is_hierarchical():
    """The all-gather DCN model assumes the topology-optimal hierarchical
    schedule (cross hosts once, broadcast over ICI) — the same convention
    as all-reduce: per-device share = payload*(nb-1)/nb/chips."""
    from openkeonspark_tpu.parallel.comm import _dcn_share
    groups = [list(range(16))]
    payload = 16000
    d = _dcn_share("all-gather", payload, groups, 4)
    assert abs(d - payload * (4 - 1) / 4 / 4) < 1e-6
    # group inside one host: pure ICI
    assert _dcn_share("all-gather", payload, [[0, 1, 2, 3]], 4) == 0.0
