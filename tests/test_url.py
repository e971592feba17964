"""URL canonicalization + URL-level dedup (operators/curation):
normalization axes, NULL contract for non-URLs, dedup verdicts, and
the no-window scale-shape pin.
"""

import pytest

from mallarddv_spark.operators.curation import canonical_url, url_dedup

CASES = [
    # (id, raw, canonical)
    (1, "HTTP://WWW.Src1.Example.com:80//a//b/?utm_source=feed&z=1&a=2#frag",
     "http://src1.example.com/a/b?a=2&z=1"),
    (2, "https://src1.example.com/a/b", "https://src1.example.com/a/b"),
    (3, "https://user@Src1.Example.COM:443/a/b/",
     "https://src1.example.com/a/b"),
    (4, "http://src1.example.com/a//b?z=1&a=2&fbclid=xyz&ref=tw",
     "http://src1.example.com/a/b?a=2&z=1"),
    (5, "not a url 5", None),
    (6, "https://example.com", "https://example.com/"),
    (7, "ftp://Host.com:80/x/", "ftp://host.com:80/x"),  # non-http port kept
    (8, "https://h.com/?a=1&a=0", "https://h.com/?a=0&a=1"),
    (9, "https://h.com:8443/x", "https://h.com:8443/x"),  # non-default kept
    (10, "https://h.com/p?utm_medium=a&utm_campaign=b", "https://h.com/p"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u, _ in CASES], "id bigint, url string"
    )


def test_canonicalization_axes(spark, df):
    got = {r.id: r.c
           for r in df.select("id", canonical_url("url").alias("c")).collect()}
    for i, _, want in CASES:
        assert got[i] == want, (i, got[i], want)


def test_options(spark):
    df = spark.createDataFrame(
        [(1, "https://www.h.com/p?ref=x&page=2")], "id bigint, url string"
    )
    keep_www = df.select(
        canonical_url("url", strip_www=False).alias("c")
    ).first().c
    assert keep_www == "https://www.h.com/p?page=2"
    keep_ref = df.select(
        canonical_url("url", strip_params=()).alias("c")
    ).first().c
    assert keep_ref == "https://h.com/p?page=2&ref=x"


def test_url_dedup_verdicts(spark, df):
    out = {r.id: r for r in url_dedup(df, "id", "url").collect()}
    # 1 and 4 collapse; 2 and 3 collapse; min id keeps
    assert out[1].keep and not out[4].keep
    assert out[2].keep and not out[3].keep
    # non-URL rows always keep, with NULL canonical
    assert out[5].keep and out[5].canonical_url is None
    for i in (6, 7, 8, 9, 10):
        assert out[i].keep


def test_dedup_plan_no_window(spark, df):
    """The min-id pick must be a groupBy aggregate, never a window
    partitioned by the URL (a mega-duplicated URL would serialize its
    copies into one task — the incremental_dedup discipline)."""
    from mallarddv_spark.plans.audit import plan_report

    out = url_dedup(df, "id", "url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan.lower()
    assert plan_report(out)["python_stages"] == 0


def test_canonicalization_idempotent(spark):
    """canonical_url is a projection: canonical(canonical(u)) ==
    canonical(u) — hypothesis-generated URLs over every axis the
    normalizer touches (case, www, ports, userinfo, duplicate slashes,
    trailing slash, fragments, tracking + regular params in any
    order)."""
    from hypothesis import given, settings, strategies as st

    host_chars = st.text("abcXYZ09-", min_size=1, max_size=8)
    param = st.one_of(
        st.sampled_from(["utm_source=x", "utm_medium=m", "fbclid=1",
                         "ref=tw", "gclid=9"]),
        st.tuples(st.text("abz", min_size=1, max_size=3),
                  st.text("019", min_size=0, max_size=3)).map(
            lambda kv: f"{kv[0]}={kv[1]}"),
    )
    urls = st.builds(
        lambda scheme, www, host, port, segs, slash, params, frag:
            scheme + "://" + www + host + ".com" + port
            + "".join("/" + s for s in segs) + slash
            + ("?" + "&".join(params) if params else "")
            + ("#" + frag if frag else ""),
        st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
        st.sampled_from(["", "www.", "WWW.", "user@", "user@www."]),
        host_chars,
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.lists(st.text("abC1/", min_size=0, max_size=4), max_size=3),
        st.sampled_from(["", "/", "//"]),
        st.lists(param, max_size=4),
        st.sampled_from(["", "f", "x=1"]),
    )

    @given(st.lists(urls, min_size=1, max_size=24, unique=True))
    @settings(max_examples=12, deadline=None)
    def run(batch):
        df = spark.createDataFrame([(u,) for u in batch], "url string")
        once = df.select(canonical_url("url").alias("c")).collect()
        twice = (
            df.select(canonical_url("url").alias("u1"))
            .select(canonical_url("u1").alias("c"))
            .collect()
        )
        assert [r.c for r in once] == [r.c for r in twice]
        # and every canonical is lowercase-scheme with no fragment,
        # no userinfo, no tracking params
        for r in once:
            if r.c is None:
                continue
            assert "#" not in r.c and "@" not in r.c
            assert "utm_" not in r.c and "fbclid" not in r.c
            scheme = r.c.split("://")[0]
            assert scheme == scheme.lower()

    run()
