"""Unit pins for bench.plan_hash's string canonicalization — the gid
invariances in particular, which absorb RewriteDistinctAggregates'
expr-id-iteration-dependent branch order (and the attribute-order
permutation it drags through every list on those lines) without hiding
real structural changes."""

from __future__ import annotations

from bench import _canon_plan_text

# The two line forms actually observed for the same query planned twice
# in one session (text_nb_lang_confusion, multi-countDistinct): the gid
# flip permutes the Expand branch lists AND the attribute order of every
# keys/output/projection list.
_VARIANT_A = """\
HashAggregate(keys=[doc_id#5L, tok#7, gid#9], functions=[], output=[doc_id#5L, tok#7, gid#9])
Expand [[doc_id#5L, null, 1], [null, tok#7, 2]], [doc_id#5L, tok#7, gid#9]
HashAggregate(keys=[], functions=[partial_count(tok#7) FILTER (WHERE (gid#9 = 2)), partial_count(doc_id#5L) FILTER (WHERE (gid#9 = 1))], output=[count#11L, count#12L])"""

_VARIANT_B = """\
HashAggregate(keys=[tok#7, doc_id#5L, gid#9], functions=[], output=[tok#7, doc_id#5L, gid#9])
Expand [[null, doc_id#5L, 2], [tok#7, null, 1]], [tok#7, doc_id#5L, gid#9]
HashAggregate(keys=[], functions=[partial_count(tok#7) FILTER (WHERE (gid#9 = 1)), partial_count(doc_id#5L) FILTER (WHERE (gid#9 = 2))], output=[count#11L, count#12L])"""


def test_gid_permutation_is_invisible():
    assert _canon_plan_text(_VARIANT_A) == _canon_plan_text(_VARIANT_B)


def test_keys_functions_swap_still_flips():
    a = "HashAggregate(keys=[a#1, gid#2], functions=[count(b#3)], output=[v#4L])"
    b = "HashAggregate(keys=[b#3, gid#2], functions=[count(a#1)], output=[v#4L])"
    assert _canon_plan_text(a) != _canon_plan_text(b)


def test_filter_clause_commas_do_not_split_elements():
    # elements containing parenthesized commas must sort as whole units
    line = (
        "HashAggregate(keys=[gid#1], functions=[count(x#2) FILTER (WHERE (gid#1 = 1)),"
        " count(y#3) FILTER (WHERE (gid#1 = 2))], output=[a#4L, b#5L])"
    )
    out = _canon_plan_text(line)
    assert out.count("FILTER") == 2
    assert "count(x#) FILTER (WHERE (gid# = §))" in out


def test_non_gid_lines_keep_list_order():
    a = "Project [x#1, y#2]"
    b = "Project [y#2, x#1]"
    assert _canon_plan_text(a) != _canon_plan_text(b)
