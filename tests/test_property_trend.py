"""Property-based test (hypothesis): group_trend's exact integer OLS
contract — cents pre-scaling, per-group x centering, sign-split HALF_UP
integer division at 10^6 — must agree with a direct Python transcription
in unbounded integer arithmetic on randomized groups (duplicate x,
negative values, single-point groups, constant-x groups).

Few examples, many groups per example: each example costs a Spark job,
so the data per example carries the variety.
"""

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

group_strategy = st.lists(
    st.lists(
        st.tuples(
            st.integers(0, 60),                    # x (month index)
            st.integers(-10**7, 10**7),            # y in cents
        ),
        min_size=1,
        max_size=10,
    ),
    min_size=5,
    max_size=15,
)

SCALE = 6
P = 10**SCALE


def _expected(points):
    """Transcription of operators/stats.trend_steps in Python ints."""
    n = len(points)
    x0 = min(x for x, _ in points)
    xc = [x - x0 for x, _ in points]
    y2 = [c for _, c in points]
    sx, sy2 = sum(xc), sum(y2)
    sxx = sum(a * a for a in xc)
    sxy2 = sum(a * b for a, b in zip(xc, y2))
    den = n * sxx - sx * sx
    num2 = n * sxy2 - sx * sy2
    if den == 0:
        return (n, None, None)
    q = (2 * abs(num2) * P + 100 * den) // (200 * den)
    if num2 < 0:
        q = -q
    a2 = sy2 * (P // 100) - q * sx
    qi = (2 * abs(a2) + n) // (2 * n)
    if a2 < 0:
        qi = -qi
    return (n, Decimal(q).scaleb(-SCALE), Decimal(qi).scaleb(-SCALE))


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(group_strategy)
def test_group_trend_matches_integer_transcription(spark, groups):
    from etl_gamma_spark.operators.stats import group_trend

    rows = [
        (gi, x, Decimal(cents).scaleb(-2))
        for gi, pts in enumerate(groups)
        for x, cents in pts
    ]
    df = spark.createDataFrame(rows, "g int, x long, y decimal(18,2)")
    got = {
        r.g: (r.n_points, r.slope, r.intercept)
        for r in group_trend(df, ["g"], "x", "y").collect()
    }
    want = {gi: _expected(pts) for gi, pts in enumerate(groups)}
    assert got == want
