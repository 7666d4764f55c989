"""Deterministic interleaved text+media corpus generator (FIXTURES.md §1).

Each document is a well-formed news-like HTML page assembled from seeded
building blocks (mirroring what the reference was exercised on,
test/url_test.txt / pictext.txt): a POSITIVE-class content container with
comma-seeded paragraphs, inline dated images, boilerplate blocks matching
UNLIKELY/NEGATIVE regexes, duplicate-src images, tiny icons and
``data:image`` srcs. The page is split into the ``spans`` array — markup
chunks as kind='html' spans, media attachments as kind='image' spans —
exactly the input shape mandated by BASELINE.json.input_hint.

Generation is a pure function of ``doc_index`` (no wall clock, fixed
word tables), so the corpus is reproducible at any scale and any
partitioning. ~1% of documents are "giant" (100x paragraph count) to
exercise the skew/salting path.
"""

from __future__ import annotations

import random
import zlib
from collections.abc import Iterator

import pandas as pd

WORDS = (
    "government region officials residents morning emergency districts "
    "rescue coastal buildings thousands aftershocks magnitude seismologists "
    "power evening medical convoys troops state economy market policy "
    "minister council election report analysis weather storm harvest"
).split()

SITES = ("news.alpha.example.com", "daily.beta.example.org", "press.gamma.example.net")

GIANT_EVERY = 101  # ~1% giant documents (100x paragraphs)
NUM_PARTS = 64  # stored partition column domain: part = hash(doc_id) % NUM_PARTS


def stored_part(doc_id: str, num_parts: int = NUM_PARTS) -> int:
    """Stable stored partition id (crc32-based; engine-independent)."""
    return zlib.crc32(doc_id.encode()) % num_parts


def _paragraph(rng: random.Random) -> str:
    n_words = rng.randrange(12, 30)
    words = [WORDS[rng.randrange(len(WORDS))] for _ in range(n_words)]
    # seeded comma positions drive the comma-segment scoring
    for i in range(2, n_words - 2, rng.randrange(4, 8)):
        words[i] = words[i] + ","
    return " ".join(words) + "."


def make_document(doc_index: int) -> dict:
    """Pure doc_index -> {doc_id, base_uri, part, spans}."""
    rng = random.Random(0xC0FFEE ^ (doc_index * 2654435761 % 2**61))
    doc_id = f"doc-{doc_index:09d}"
    site = SITES[rng.randrange(len(SITES))]
    day = 1 + rng.randrange(28)
    base_uri = f"http://{site}/2019-06/{day:02d}/article{doc_index}.html"

    is_giant = (doc_index % GIANT_EVERY) == GIANT_EVERY - 1
    n_paras = rng.randrange(3, 13) * (100 if is_giant else 1)
    n_imgs = rng.randrange(0, 5)

    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str | None = None, media_ref: str | None = None):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    add(
        "html",
        f"<html><head><title>Story {doc_index}</title></head><body>"
        f'<div id="nav"><a href="/">home</a><a href="/w">world</a></div>'
        f'<div class="article content" id="main">',
    )

    img_slots = sorted(rng.randrange(n_paras) for _ in range(n_imgs))
    img_k = 0
    for p in range(n_paras):
        add("html", f"<p>{_paragraph(rng)}</p>")
        while img_k < len(img_slots) and img_slots[img_k] == p:
            k = img_k
            src = f"http://{site}/2019-06/{day:02d}/photo{doc_index}_{k}.jpg"
            style = rng.random()
            if style < 0.5:
                # attributed inline image inside an html span
                w, h = 400 + rng.randrange(400), 300 + rng.randrange(300)
                add("html", f'<img src="{src}" width="{w}" height="{h}" alt="photo">')
            else:
                # bare media attachment span (reconstructed as plain <img>)
                add("image", media_ref=src)
            img_k += 1

    # boilerplate battery: duplicate-src image, icon, data-uri, link farm,
    # sidebar/comment/share blocks (all must be pruned / rejected)
    dup_src = f"http://{site}/2019-06/{day:02d}/dup{doc_index}.jpg"
    add(
        "html",
        f'<img src="{dup_src}" width="500" height="400">'
        f'<img src="{dup_src}" width="500" height="400">'
        f'<img src="http://{site}/static/logo.png" width="88" height="31">'
        f'<img src="data:image/gif;base64,R0lGODlh" width="600" height="600">',
    )
    add("html", "</div>")
    add(
        "html",
        f'<div class="sidebar"><ul>'
        f'<li><a href="/most-read">most read item one</a></li>'
        f'<li><a href="/trending">trending item two</a></li></ul></div>'
        f'<div id="comment"><p>first comment wow nice</p></div>'
        f'<div class="share"><a href="/share">share this</a>'
        f'<img src="http://{site}/static/share-icon.png" width="32" height="32"></a></div>'
        f'<div class="footer">copyright {site}</div>'
        f"</body></html>",
    )

    return {
        "doc_id": doc_id,
        "base_uri": base_uri,
        "part": stored_part(doc_id),
        "spans": spans,
    }


SYNTH_SCHEMA = (
    "doc_id string, base_uri string, part int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [make_document(int(i)) for i in pdf["id"]]
        yield pd.DataFrame(rows)


def synth_corpus_df(spark, n_docs: int, num_slices: int | None = None):
    """Distributed corpus build: spark.range -> mapInPandas(make_document)."""
    rng_df = spark.range(0, n_docs, numPartitions=num_slices)
    return rng_df.mapInPandas(_gen_batches, schema=SYNTH_SCHEMA)


def write_synth_corpus(spark, n_docs: int, out_path: str, partition_by_part: bool = True):
    df = synth_corpus_df(spark, n_docs)
    writer = df.write.mode("overwrite")
    if partition_by_part:
        writer = writer.partitionBy("part")
    writer.parquet(out_path)
    return out_path
