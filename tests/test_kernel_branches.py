"""Unit vectors for reference branches not covered by the main quirk
suite: video-embed survival (A3), header cleanup (A4), comma-rich
conditional-clean skip (A5), strong-parent normalization (I2a), date
distance scoring (I4), apology path (C12)."""

import datetime as dt

from readabilityimproved_spark.dom import parse
from readabilityimproved_spark.kernel.readability import (
    IMG_SCORE,
    ReadabilityKernel,
    extract_document,
    get_img_score,
)

BASE = "http://news.site/2019-06/18/article.html"
REF = dt.datetime(2019, 6, 18, 12, 0, 0)


def _kernel(html="<p></p>", base=""):
    return ReadabilityKernel(html, base_uri=base, ref_date=REF)


def test_video_iframe_survives_clean():
    doc = parse(
        '<div><iframe src="http://www.youtube.com/embed/x">v</iframe>'
        '<iframe src="http://other.example/ad">a</iframe></div>'
    )
    k = _kernel()
    k._clean(doc.body(), "iframe")
    frames = doc.body().get_elements_by_tag("iframe", include_self=False)
    assert len(frames) == 1
    assert "youtube" in frames[0].attr("src")


def test_clean_headers_by_weight_and_density():
    doc = parse(
        '<div><h3 class="footer">bad weight</h3>'
        '<h3><a href="/x">all link text here</a></h3>'
        "<h3>plain kept header</h3></div>"
    )
    k = _kernel()
    k._clean_headers(doc.body())
    kept = doc.body().get_elements_by_tag("h3", include_self=False)
    assert len(kept) == 1 and kept[0].text() == "plain kept header"


def test_comma_rich_skips_conditional_clean():
    # >= 10 comma segments bypasses the structural checks entirely
    # (Readability.java:611); this div is img>p but comma-rich -> kept
    commas = "a, b, c, d, e, f, g, h, i, j, k"
    doc = parse(f'<div id="w"><div><img src="http://x/a.jpg"><p>{commas}</p>'
                f'<img src="http://x/b.jpg"></div></div>')
    k = _kernel()
    wrapper = doc.body().get_elements_by_tag("div", include_self=False)[0]
    k._clean_conditionally(wrapper, "div")
    assert len(wrapper.get_elements_by_tag("div", include_self=False)) == 1

    # same structure, few commas -> removed (img > p)
    doc2 = parse('<div id="w"><div><img src="http://x/a.jpg"><p>short text '
                 'long enough to be over twentyfive</p>'
                 '<img src="http://x/b.jpg"></div></div>')
    wrapper2 = doc2.body().get_elements_by_tag("div", include_self=False)[0]
    k._clean_conditionally(wrapper2, "div")
    assert len(wrapper2.get_elements_by_tag("div", include_self=False)) == 0


def test_check_strong_skips_to_parent():
    doc = parse("<p><strong><img src='http://x/a.jpg'></strong></p>")
    k = _kernel()
    img = doc.body().get_elements_by_tag("img", include_self=False)[0]
    strong = img.parent
    assert strong.tag == "strong"
    assert k._check_strong(strong).tag == "p"


def _img_score_for_src(src, base):
    doc = parse(f'<img src="{src}">', base)
    img = doc.body().get_elements_by_tag("img", include_self=False)[0]
    k = _kernel(base=base)
    img.set_attr(IMG_SCORE, "0")
    k._init_img_tag_score(img)
    return get_img_score(img)


def test_date_distance_branches_with_pub_date():
    # src scores: POSITIVE_IMG 'photo' +25, plus the date-distance bonus
    # vs the page date 2019-06-18 (ReadabilityForImg.java:562-575)
    assert _img_score_for_src("http://h/2019-06/18/photo.jpg", BASE) == 25 + 30  # d=0
    assert _img_score_for_src("http://h/2019-06/16/photo.jpg", BASE) == 25 + 20  # d=2
    assert _img_score_for_src("http://h/2019-06/13/photo.jpg", BASE) == 25 + 10  # d=5
    assert _img_score_for_src("http://h/2019-06/08/photo.jpg", BASE) == 25       # d=10: no term
    assert _img_score_for_src("http://h/2019-05/29/photo.jpg", BASE) == 25 - 20  # 15<d=20<30 -> -d
    assert _img_score_for_src("http://h/2019-05/01/photo.jpg", BASE) == 25 - 40  # d=48>30


def test_date_distance_without_pub_date_uses_ref_clock():
    # undated page -> new Date() branch (our ref_date), penalties /3
    # (ReadabilityForImg.java:578-592)
    base = "http://news.site/undated/article.html"
    assert _img_score_for_src("http://h/2019-06/18/photo.jpg", base) == 25 + 30  # d=0
    # d = 20.5 days -> truncates 20 -> -= 20/3 = 6
    assert _img_score_for_src("http://h/2019-05/29/photo.jpg", base) == 25 - 6
    assert _img_score_for_src("http://h/2019-04/01/photo.jpg", base) == 25 - 20  # d>30


def test_apology_path_text_variant():
    # nothing scores on either pass -> the apology paragraph (C12,
    # Readability.java:88-90)
    r = extract_document('<div class="sidebar"></div>', variant="text")
    assert len(r.spans) == 1
    assert "Sorry, readability" in r.spans[0][1]


def test_img_variant_never_apologizes():
    r = extract_document('<div class="sidebar"></div>', variant="img")
    assert r.spans == []


def test_image_at_article_start_and_end():
    paras = "".join(
        f"<p>word{i} lorem ipsum dolor sit, amet consectetur adipiscing "
        f"elit sed do eiusmod tempor.</p>"
        for i in range(3)
    )
    first = '<img src="http://news.site/2019-06/18/photo_first.jpg" width="640" height="420">'
    last = '<img src="http://news.site/2019-06/18/photo_last.jpg" width="640" height="420">'
    html = f'<div class="article content">{first}{paras}{last}</div>'
    r = extract_document(html, base_uri=BASE)
    kinds = [s[0] for s in r.spans]
    assert kinds[0] == "image" and kinds[-1] == "image"
    assert r.spans[0][2].endswith("photo_first.jpg")
    assert r.spans[-1][2].endswith("photo_last.jpg")
    assert [s[3] for s in r.spans] == list(range(len(r.spans)))


def test_accepted_image_outside_article_appended():
    # grabImg scans the whole document; an accepted image outside the
    # gathered article is appended after the article spans
    paras = "".join(
        f"<p>word{i} lorem ipsum dolor sit, amet consectetur adipiscing "
        f"elit sed do eiusmod tempor.</p>"
        for i in range(3)
    )
    html = (
        f'<div class="article content">{paras}</div>'
        f'<div class="gallery"><img src="http://news.site/2019-06/18/photo_out.jpg"'
        f' width="640" height="420"></div>'
    )
    r = extract_document(html, base_uri=BASE)
    if "http://news.site/2019-06/18/photo_out.jpg" in r.images:
        assert r.spans[-1][0] == "image"
        assert r.spans[-1][2].endswith("photo_out.jpg")
    # text spans always precede the appended out-of-article image
    assert [s[0] for s in r.spans][:3] == ["text", "text", "text"]


def test_high_scoring_sibling_joins_article():
    def block(cls, word):
        return (
            f'<div class="{cls}">'
            + "".join(
                f"<p>{word}{i} lorem ipsum dolor sit, amet consectetur "
                f"adipiscing elit sed do eiusmod.</p>"
                for i in range(3)
            )
            + "</div>"
        )

    html = block("article content", "main") + block("text", "intro")
    r = extract_document(html, base_uri=BASE)
    texts = " ".join(s[1] for s in r.spans if s[0] == "text")
    assert "main0" in texts and "intro0" in texts  # both blocks gathered


def test_abs_url_cache_isolated_per_base():
    # the memoized URL resolver must key on the document base
    a = extract_document(
        '<div class="article content"><p>alpha beta, gamma delta epsilon '
        'zeta eta theta.</p>'
        '<img src="pics/photo.jpg" width="640" height="420"></div>',
        base_uri="http://site-a.example/2019-06/18/x.html",
    )
    b = extract_document(
        '<div class="article content"><p>alpha beta, gamma delta epsilon '
        'zeta eta theta.</p>'
        '<img src="pics/photo.jpg" width="640" height="420"></div>',
        base_uri="http://site-b.example/2019-06/18/x.html",
    )
    if a.images:
        assert a.images[0].startswith("http://site-a.example/")
    if b.images:
        assert b.images[0].startswith("http://site-b.example/")
    assert a.spans != b.spans or not a.images  # media_refs differ when accepted
