"""URL canonicalization + per-domain stats."""

import pandas as pd
import pyarrow as pa
import ray.data

from mini_ivf_ray.functions.urls import canonicalize_url, host_of, registered_domain
from mini_ivf_ray.pipelines.web import canonical_urls, dedup_by_canonical_url, domain_stats
from mini_ivf_ray.sources.pages import generate_pages


def test_canonicalize_rules():
    cases = {
        # scheme+host lowercase, default port dropped, fragment dropped
        "HTTPS://WWW.Example.COM:443/Path/Page#frag": "https://www.example.com/Path/Page",
        "http://site.org:80/a": "http://site.org/a",
        "http://site.org:8080/a": "http://site.org:8080/a",  # non-default kept
        # tracking params dropped, remaining sorted
        "https://e.com/p?utm_source=x&b=2&a=1&gclid=zz": "https://e.com/p?a=1&b=2",
        "https://e.com/p?b=2&a=1": "https://e.com/p?a=1&b=2",
        # empty path -> /
        "https://e.com?a=1": "https://e.com/?a=1",
        "https://e.com": "https://e.com/",
        # trailing slash preserved on non-root
        "https://e.com/dir/": "https://e.com/dir/",
        # non-URL passes through
        "not a url": "not a url",
    }
    for raw, want in cases.items():
        assert canonicalize_url(raw) == want, raw
    # canonicalization is idempotent
    for raw in cases:
        assert canonicalize_url(canonicalize_url(raw)) == canonicalize_url(raw)


def test_registered_domain():
    assert registered_domain("a.b.site.co.uk") == "site.co.uk"
    assert registered_domain("x.site.example") == "site.example"
    assert registered_domain("site7.example") == "site7.example"
    assert registered_domain("deep.sub.pages.github.io") == "pages.github.io"
    assert host_of("HTTPS://Foo.Bar/q") == "foo.bar"


def test_canonical_urls_and_domain_stats_match_reference():
    tbl = generate_pages(400, seed=9)
    ds = ray.data.from_arrow(tbl)
    out = canonical_urls(ds).to_pandas()
    assert len(out) == 400
    ref = pd.DataFrame(
        {
            "url": tbl["url"].to_pylist(),
            "text": tbl["text"].to_pylist(),
        }
    )
    ref["url_canon"] = ref["url"].map(canonicalize_url)
    ref["domain"] = ref["url_canon"].map(lambda u: registered_domain(host_of(u)))
    m = out.sort_values("url").reset_index(drop=True)
    r = ref.sort_values("url").reset_index(drop=True)
    assert list(m["url_canon"]) == list(r["url_canon"])
    assert list(m["domain"]) == list(r["domain"])

    stats = domain_stats(ds).to_pandas().sort_values("domain").reset_index(drop=True)
    want = (
        ref.assign(n_chars=ref["text"].str.len())
        .groupby("domain")
        .agg(n_pages=("url", "size"), n_chars=("n_chars", "sum"))
        .reset_index()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    assert list(stats["domain"]) == list(want["domain"])
    assert list(stats["n_pages"]) == list(want["n_pages"])
    assert list(stats["n_chars"]) == list(want["n_chars"])


def test_dedup_by_canonical_merges_tracking_variants():
    base = generate_pages(50, seed=4, dup_frac=0.0)
    # add a tracking-param variant of page 0 with a LATER ts: canonical
    # dedup must keep the variant's text under the canonical url
    import numpy as np

    url0 = base["url"][0].as_py()
    ts0 = base["warc_ts"][0].as_py()
    variant = pa.table(
        {
            "url": pa.array([url0 + "?utm_source=feed&gclid=abc"], type=pa.string()),
            "warc_ts": pa.array(
                [np.datetime64("2025-01-01T00:00:00", "us")], type=pa.timestamp("us")
            ),
            "html": pa.array([base["html"][0].as_py()], type=pa.binary()),
            "text": pa.array(["replacement text"], type=pa.string()),
        }
    )
    both = pa.concat_tables([base.select(["url", "warc_ts", "html", "text"]), variant])
    out = dedup_by_canonical_url(ray.data.from_arrow(both)).to_pandas()
    assert len(out) == 50  # variant merged onto canonical url
    kept = out[out["url"] == canonicalize_url(url0)]
    assert len(kept) == 1 and kept["text"].iloc[0] == "replacement text"


def test_redact_pii():
    from mini_ivf_ray.pipelines.analysis import redact_pii

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": [
                "mail me at First.Last+tag@sub.Example.ORG today",
                "server 192.168.0.1 and phone 555-867-5309 ok",
                "nothing sensitive here 1234 5.6 plain",
            ],
        }
    )
    out = redact_pii(ray.data.from_arrow(docs)).to_pandas().sort_values("doc_id")
    assert list(out["clean_text"]) == [
        "mail me at [EMAIL] today",
        "server [IP] and phone [PHONE] ok",
        "nothing sensitive here 1234 5.6 plain",
    ]
    assert list(out["n_emails"]) == [1, 0, 0]
    assert list(out["n_ips"]) == [0, 1, 0]
    assert list(out["n_phones"]) == [0, 1, 0]
