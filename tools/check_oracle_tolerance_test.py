"""Constructed boundary cases for check_oracle.compare_frames's
float-tolerance mode (PLANS.md "tfidf 1-ulp boundary"): the 4th-decimal
flip the mode exists to tolerate, and the rank flip it must still
catch. Run: python3 tools/check_oracle_tolerance_test.py"""
import pandas as pd
import check_oracle as co


def frame(rows):
    return pd.DataFrame(rows, columns=['id', 'term_rank', 'term', 'tfidf'])


base = frame([(1, 1, 'alpha', 3.1415), (1, 2, 'beta', 2.0001)])

# 1. byte-identical -> OK, no tolerance consumed
r = co.compare_frames('text_tfidf', base.copy(), base.copy())
assert r == 'OK (2 rows)', r

# 2. the boundary case: ln differs by 1 ulp across engines, so
#    round(x, 4) lands one step apart (…1415 vs …1416) with ranks,
#    terms, counts identical -> tolerated, and says so
flip = frame([(1, 1, 'alpha', 3.1416), (1, 2, 'beta', 2.0001)])
r = co.compare_frames('text_tfidf', base, flip)
assert r.startswith('OK (2 rows, 1 cells within'), r

# 3. same cells, strict mode -> fails
r = co.compare_frames('text_tfidf', base, flip, strict=True)
assert r.startswith('VALUE MISMATCH'), r

# 4. a real score change (beyond one 4th-decimal step) -> fails
big = frame([(1, 1, 'alpha', 3.1418), (1, 2, 'beta', 2.0001)])
r = co.compare_frames('text_tfidf', base, big)
assert r.startswith('VALUE MISMATCH'), r

# 5. RANK PARITY: a boundary flip that also swaps two ranks — the
#    tfidf cells are each within tolerance of the other row's, but the
#    term column reordered -> must fail (term is byte-exact)
swap = frame([(1, 1, 'beta', 3.1416), (1, 2, 'alpha', 2.0001)])
r = co.compare_frames('text_tfidf', base, swap)
assert r.startswith('VALUE MISMATCH'), r

# 6. tolerance is per-query: the same flip on an undesignated query
#    stays strict
r = co.compare_frames('q1_agg', base, flip)
assert r.startswith('VALUE MISMATCH'), r

# 7. non-numeric garbage in a designated column -> fails, never coerced
bad = frame([(1, 1, 'alpha', 'NaNish'), (1, 2, 'beta', 2.0001)])
r = co.compare_frames('text_tfidf', base, bad)
assert r.startswith('VALUE MISMATCH'), r

print('check_oracle tolerance: 7/7 boundary cases OK')
