"""Span-sequence equality against frozen golden extraction fixtures
(BASELINE.json: "span-sequence equality (kind, text, media_ref, order)
against the reference's golden extraction fixtures via pytest").

The fixtures were frozen from the documented kernel semantics (SURVEY.md
§2 quirks included) over the deterministic synth corpus — the engine's
analogue of the reference's test/pictext.txt golden image lists plus
text-span equality. Any change to scoring, pruning, parsing, or span
emission that alters ANY of the 3321 frozen spans fails here.
"""

import json
import pathlib

import pytest

from readabilityimproved_spark.kernel.readability import extract_document
from readabilityimproved_spark.operators.extract import reconstruct_html
from readabilityimproved_spark.sources.synth import make_document

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "golden_spans.json").read_text()
)


@pytest.mark.parametrize("doc_id", sorted(GOLDEN))
def test_golden_span_sequences(doc_id):
    index = int(doc_id.split("-")[1])
    d = make_document(index)
    assert d["doc_id"] == doc_id
    r = extract_document(reconstruct_html(d["spans"]), base_uri=d["base_uri"])
    want = GOLDEN[doc_id]
    assert r.status == want["status"]
    assert r.images == want["images"]
    assert r.top_content_score == want["top_score"]
    assert [list(s) for s in r.spans] == want["spans"]


def test_golden_corpus_shape():
    # the frozen set covers the interesting regimes
    n_spans = sum(len(v["spans"]) for v in GOLDEN.values())
    n_imgs = sum(len(v["images"]) for v in GOLDEN.values())
    assert len(GOLDEN) == 60 and n_spans == 3321 and n_imgs == 124
    # at least one giant doc (100x paragraphs) is pinned
    assert any(len(v["spans"]) > 300 for v in GOLDEN.values())
