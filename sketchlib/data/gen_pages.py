"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
  (url string, warc_ts timestamp, html binary, text string, lang string)

Deterministic (seed 42, fixed epoch — no wall clock, no network):
- url: https://site{site:04d}.example/{path:06d}, site ~ Zipf(1.3) over
  1000 hosts → hot-host skew.
- lang: categorical, en ≈ 55% → hot-key skew for salting tests.
- body length: per-lang lognormal (μ,σ vary) → distinct tail-heavy
  per-lang quantile distributions (drives the flagship query).
- html: title + <p> blocks; a fixed fraction gets <script>/<style> noise.
- text: exactly extract(html) — the byte-identity invariant holds by
  construction AND is re-verified via the real extraction path in tests.

Writing is chunked via pyarrow so sf ≥ 1M rows streams without holding
everything in memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from sketchlib.data.extract import extract_series

BASE_TS = np.datetime64("2025-01-01T00:00:00")
LANGS = np.array(["en", "zh", "es", "de", "fr", "ru", "ja", "pt", "other"])
LANG_P = np.array([0.55, 0.12, 0.08, 0.06, 0.05, 0.04, 0.04, 0.03, 0.03])
# per-lang lognormal (mu, sigma) of body word counts
LANG_MU = {"en": 4.6, "zh": 4.0, "es": 4.4, "de": 4.8, "fr": 4.5,
           "ru": 4.2, "ja": 3.9, "pt": 4.3, "other": 3.5}
LANG_SIGMA = {"en": 0.9, "zh": 0.7, "es": 0.8, "de": 1.0, "fr": 0.85,
              "ru": 0.75, "ja": 0.65, "pt": 0.8, "other": 1.2}

_WORDS = np.array([
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "data", "web", "page", "crawl", "spark",
])

SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _zipf_sites(rng: np.random.Generator, n: int, n_sites: int = 1000) -> np.ndarray:
    ranks = np.arange(1, n_sites + 1, dtype=np.float64)
    p = ranks ** -1.3
    p /= p.sum()
    return rng.choice(n_sites, size=n, p=p)


def gen_chunk(row_start: int, n: int, seed: int = 42) -> pd.DataFrame:
    """Generate rows [row_start, row_start+n) deterministically — the chunk
    content depends only on absolute row ids, so any chunking yields the
    same table (resume/partition-friendly)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, row_start, n]))
    row_ids = np.arange(row_start, row_start + n)
    sites = _zipf_sites(rng, n)
    urls = [f"https://site{s:04d}.example/{r:06d}" for s, r in zip(sites, row_ids)]
    ts = BASE_TS + row_ids.astype("timedelta64[s]")
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    lang_names = LANGS[langs]

    mu = np.array([LANG_MU[l] for l in lang_names])
    sigma = np.array([LANG_SIGMA[l] for l in lang_names])
    n_words = np.maximum(3, rng.lognormal(mu, sigma).astype(np.int64))
    n_words = np.minimum(n_words, 20_000)

    word_idx_all = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    noisy = rng.random(n) < 0.2  # fixed fraction gets script/style noise

    htmls: list[bytes] = []
    pos = 0
    for i in range(n):
        w = _WORDS[word_idx_all[pos : pos + n_words[i]]]
        pos += n_words[i]
        paras = []
        for j in range(0, len(w), 40):
            paras.append("<p>" + " ".join(w[j : j + 40]) + "</p>")
        noise = ""
        if noisy[i]:
            noise = (
                "<script type='text/javascript'>var x=42; tracker('"
                + str(row_ids[i]) + "');</script><style>.c{color:red}</style>"
            )
        html = (
            f"<html><head><title>T{row_ids[i]}</title>{noise}</head><body>"
            + "".join(paras)
            + "</body></html>"
        )
        htmls.append(html.encode("utf-8"))

    texts = extract_series(pd.Series(htmls)).tolist()
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts),
            "html": htmls,
            "text": texts,
            "lang": lang_names,
        }
    )


def write_pages(path: str, n_rows: int, seed: int = 42, chunk: int = 100_000) -> None:
    with pq.ParquetWriter(path, SCHEMA) as w:
        for start in range(0, n_rows, chunk):
            cnt = min(chunk, n_rows - start)
            pdf = gen_chunk(start, cnt, seed)
            w.write_table(pa.Table.from_pandas(pdf, schema=SCHEMA, preserve_index=False))


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pages.parquet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    write_pages(out, n)
    print(f"wrote {n} rows to {out}")
