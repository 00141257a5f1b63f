"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1).

Schema per ``BASELINE.json.input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Everything is a pure function of ``(row_index, seed)`` so any scale factor is
reproducible byte-for-byte and any slice can be generated independently
(the generator is itself runnable as a parallel Ray Data pipeline over row
ranges — see :func:`synth_pages_dataset`). The stored ``text`` column is the
output of the repo's own scalar extractor applied to ``html``, which is the
byte-identity invariant under test.

Link structure: out-degree ~ Zipf(a=1.7) capped at 64 targeting other rows
(preferentially low indices → popular pages get high in-degree), plus hub
pages every ``hub_every`` rows with out-degree ``n // 20`` (capped) to
exercise skew, mirroring web hubs. The graph is closed over the table.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

from ..functions.extract import extract_text

__all__ = ["page_row", "synth_pages_table", "write_synth_pages", "synth_pages_dataset", "PAGES_SCHEMA"]

_LANGS = ["en", "de", "fr", "zh"]

_WORDS = (
    "the quick brown fox jumps over lazy dog data graph ray arrow parquet "
    "stream vertex edge label match count page link crawl web text token "
    "shuffle block actor superstep partition hash rank cluster node worker "
    "köln naïve 数据 图形 café übung".split()
)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def _url_of(i: int, n_hosts: int) -> str:
    return f"https://site{i % n_hosts}.example/p/{i}"


def _rng_for(i: int, seed: int) -> np.random.Generator:
    # per-row independent stream → any row is generable in isolation
    return np.random.default_rng(np.random.SeedSequence([seed, i]))


def _out_degree(i: int, n: int, rng: np.random.Generator, hub_every: int) -> int:
    if hub_every and i % hub_every == 0 and i > 0:
        return min(max(n // 20, 2), 4096)
    # Zipf(1.7) capped at 64; -1 so degree 0 is possible
    return min(int(rng.zipf(1.7)) - 1 + int(rng.integers(0, 3)), 64)


def page_row(i: int, n: int, seed: int = 42, n_hosts: int | None = None, hub_every: int | None = None):
    """Generate row ``i`` of an ``n``-row pages table. Pure in (i, n, seed)."""
    if n_hosts is None:
        n_hosts = max(10, n // 100)
    if hub_every is None:
        hub_every = max(200, n // 100)
    rng = _rng_for(i, seed)
    url = _url_of(i, n_hosts)
    deg = _out_degree(i, n, rng, hub_every)
    # Preferential attachment to low indices: floor(n * u^3) biases to 0.
    targets = (rng.random(deg) ** 3 * n).astype(np.int64)
    targets = targets[targets != i]

    nwords = int(rng.integers(20, 120))
    widx = rng.integers(0, len(_WORDS), nwords)
    words = [_WORDS[j] for j in widx]
    title = " ".join(words[:4])

    parts = [
        "<html><head><title>",
        _html.escape(title),
        "</title>",
        "<style>body { color: #000; }</style>",
        "<script>var x = 1 < 2 && 3 > 2;</script>",
        "</head><body>",
    ]
    if i % 7 == 0:
        parts.append("<!-- comment with <fake> tag & entity -->")
    parts.append("<h1>" + _html.escape(title) + "</h1>")
    # paragraphs with entities / nested / unclosed tags sprinkled deterministically
    body_words = []
    for k, w in enumerate(words):
        if k % 17 == 5:
            body_words.append("&amp;" if k % 2 else "&lt;tag&gt;")
        if k % 23 == 7:
            body_words.append("<b><i>" + _html.escape(w) + "</i></b>")
        elif k % 29 == 11:
            body_words.append("<span class='x'>" + _html.escape(w))  # unclosed
        else:
            body_words.append(_html.escape(w))
        if k % 13 == 12:
            body_words.append("</p><p>")
    parts.append("<p>" + " ".join(body_words) + "</p>")
    for t in targets:
        tu = _url_of(int(t), n_hosts)
        if t % 11 == 3:
            parts.append(f'<a class="l" href="{tu}#frag">anchor {t}</a>')
        elif t % 11 == 7:
            parts.append(f"<a href='{tu}'>anchor&nbsp;{t}</a>")
        else:
            parts.append(f'<a href="{tu}">anchor {t}</a>')
    parts.append("</body></html>")
    html_doc = "".join(parts).encode("utf-8")

    return {
        "url": url,
        "warc_ts": _EPOCH_2024 + np.timedelta64(i, "s").astype("timedelta64[us]"),
        "html": html_doc,
        "text": extract_text(html_doc),
        "lang": _LANGS[i % len(_LANGS)],
    }


def synth_pages_table(n: int, seed: int = 42, start: int = 0, stop: int | None = None,
                      n_hosts: int | None = None) -> pa.Table:
    """Rows ``[start, stop)`` of the n-row table as one Arrow table.
    Pure in (n, seed, n_hosts); ``n_hosts`` defaults to page_row's
    max(10, n // 100)."""
    stop = n if stop is None else stop
    rows = [page_row(i, n, seed, n_hosts=n_hosts) for i in range(start, stop)]
    cols = {name: [r[name] for r in rows] for name in PAGES_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)


def write_synth_pages(path: str, n: int, seed: int = 42, rows_per_file: int = 20_000) -> str:
    """Write the n-row pages table as a directory of parquet part files.

    Chunked so memory stays bounded; each part file covers a contiguous row
    range (resumable layout: rerun skips parts that already exist).
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for start in range(0, n, rows_per_file):
        stop = min(start + rows_per_file, n)
        fn = os.path.join(path, f"pages-{start:010d}.parquet")
        if os.path.exists(fn):
            continue
        pq.write_table(synth_pages_table(n, seed, start, stop), fn)
    return path


def synth_pages_dataset(n: int, seed: int = 42, rows_per_block: int = 5_000):
    """The pages table as a lazy Ray Dataset generated in parallel —
    ``range → map_batches(generate block)`` so even generation streams."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return synth_pages_table(n, seed, int(ids[0]), int(ids[-1]) + 1)

    return rd.range(n, override_num_blocks=max(1, n // rows_per_block)).map_batches(
        gen, batch_format="pyarrow", batch_size=rows_per_block
    )
