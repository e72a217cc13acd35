"""Property test for the CEP reformulation (operators/cep.py).

The batch query and the DuckDB oracle both implement `view click*
purchase` as "a purchase whose nearest preceding non-click event is a
view"; the streaming twin implements the restart-on-view NFA.  This
test pins the claim that those are THE SAME function of the event log
— on arbitrary event sequences, not just the fixtures — by running
both as pure-Python folds over hypothesis-generated per-user symbol
sequences.  (Engine parity Spark↔DuckDB is covered by the oracle gate;
this covers the SEMANTIC equivalence the reformulation rests on.)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_TYPES = ["view", "click", "purchase", "signup", "error"]


def nfa_matches(seq: list[str]) -> list[tuple[int, int, int]]:
    """Restart-on-view NFA (the streaming/cep.py fold, positions for
    ids): returns (start_pos, end_pos, n_clicks) per completed match."""
    out, start, clicks = [], None, 0
    for i, et in enumerate(seq):
        if et == "view":
            start, clicks = i, 0
        elif et == "click":
            if start is not None:
                clicks += 1
        elif et == "purchase" and start is not None:
            out.append((start, i, clicks))
            start = None
        else:  # signup / error / unmatched purchase
            start = None
    return out


def locf_matches(seq: list[str]) -> list[tuple[int, int, int]]:
    """The LOCF-window reformulation (operators/cep.py): a purchase at
    i matches iff the last non-click before i is a view at j; clicks
    between = i - j - 1 (everything between IS a click)."""
    out, last_nc = [], None  # (pos, type) of last non-click seen
    for i, et in enumerate(seq):
        if et == "purchase" and last_nc is not None and last_nc[1] == "view":
            out.append((last_nc[0], i, i - last_nc[0] - 1))
        if et != "click":
            last_nc = (i, et)
    return out


@settings(max_examples=500, deadline=None)
@given(st.lists(st.sampled_from(_TYPES), max_size=60))
def test_nfa_equals_locf_reformulation(seq):
    assert nfa_matches(seq) == locf_matches(seq)


def test_known_sequences():
    """Anchor cases from the module docstring discussion."""
    assert nfa_matches(["view", "click", "click", "purchase"]) == [(0, 3, 2)]
    # a second view restarts the pending match
    assert nfa_matches(["view", "click", "view", "purchase"]) == [(2, 3, 0)]
    # a purchase consumes the pending view — the next purchase is bare
    assert nfa_matches(["view", "click", "purchase", "purchase"]) == [(0, 2, 1)]
    # error resets
    assert nfa_matches(["view", "error", "purchase"]) == []
    for s in (
        ["view", "click", "click", "purchase"],
        ["view", "click", "view", "purchase"],
        ["view", "click", "purchase", "purchase"],
        ["view", "error", "purchase"],
    ):
        assert nfa_matches(s) == locf_matches(s)
