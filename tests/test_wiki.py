"""enwik9-pipeline (wikiprep) roundtrip tests.

Covers every transform branch of the STARLIT-equivalent preprocessor
(reference: src/runner/enwik9-prep.cpp, src/preprocess/enwik9/*): header
compaction (id delta, timestamp, generic tags, contributor block, raw
fallback), entity coding incl. numeric entities and control-byte escapes,
lang-link tail extraction, redirect-aware reordering, id-sort restore,
permutation fallback, stored fallback, and the intro/coda split.
"""
import pytest

from gmix_tpu.preprocess import wiki


def _page(pid, title, text_lines, rev_id=None, ts="2004-06-12T09:33:17Z",
          user="SomeEditor", uid=777, redirect=False, minor=False,
          comment=None, restrictions=None):
    rev_id = rev_id if rev_id is not None else pid * 13 + 5
    lines = [
        "  <page>",
        f"    <title>{title}</title>",
        f"    <id>{pid}</id>",
    ]
    if restrictions:
        lines.append(f"    <restrictions>{restrictions}</restrictions>")
    lines += [
        "    <revision>",
        f"      <id>{rev_id}</id>",
        f"      <timestamp>{ts}</timestamp>",
        "      <contributor>",
        f"        <username>{user}</username>",
        f"        <id>{uid}</id>",
        "      </contributor>",
    ]
    if minor:
        lines.append("      <minor />")
    if comment:
        lines.append(f"      <comment>{comment}</comment>")
    body = list(text_lines)
    if redirect:
        body = ["#REDIRECT [[Other article]]"]
    first = body[0] if body else ""
    rest = body[1:]
    text = [f'      <text xml:space="preserve">{first}']
    text += rest
    text[-1] = text[-1] + "</text>"
    lines += text
    lines += ["    </revision>", "  </page>"]
    return "\n".join(lines) + "\n"


INTRO = (
    "<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.3/\">\n"
    "  <siteinfo>\n"
    "    <sitename>Wikipedia</sitename>\n"
    "  </siteinfo>\n"
)
CODA = "  <page>\n    <title>Truncated article that was cut mid-"


def _corpus(order=True):
    pages = [
        _page(10, "Alpha", [
            "Alpha is a letter. It is written &quot;A&quot; &amp; more.",
            "Escaped markup: &lt;b&gt;bold&lt;/b&gt; and &amp;quot;deep&amp;quot;.",
            "Numeric entity: &#960; and &#8212; but not &#65; or &#05;.",
            "",
            "[[de:Alpha]]",
            "[[fr:Alpha]]",
            "[[zh-min-nan:Alpha]]",
        ]),
        _page(12, "Beta", ["Beta follows alpha."], minor=True,
              comment="fixed a typo"),
        _page(13, "Gamma redirect", [], redirect=True),
        _page(20, "Delta", [
            "Delta has no lang links and mentions [[category:Greek]].",
            "It has an internal [[link]] too.",
        ], restrictions="move=:edit="),
        _page(25, "Epsilon", [
            "Contains a weird header follower.",
            "[[ja:イプシロン]]",
        ]),
    ]
    return (INTRO + "".join(pages) + CODA).encode()


def test_roundtrip_identity_no_order():
    data = _corpus()
    blob = wiki.encode(data)
    assert wiki.decode(blob) == data


def test_roundtrip_with_reorder():
    data = _corpus()
    # order file indexes NON-REDIRECT articles (article_reorder.h:110-128):
    # non-redirect: 0=Alpha 1=Beta 2=Delta 3=Epsilon
    order = b"3\n0\n2\n"  # Epsilon, Alpha, Delta; Beta + redirect appended
    blob = wiki.encode(data, order)
    assert wiki.decode(blob) == data
    # the reorder must actually change the stored article order
    blob_noorder = wiki.encode(data)
    assert blob != blob_noorder


def test_side_streams_shrink_main():
    """Header/timestamp/id/entity compaction must make main smaller than the
    original article bytes (the point of the transform)."""
    data = _corpus()
    blob = wiki.encode(data)
    import struct

    assert blob[:4] == b"GWP1"
    lens = struct.unpack("<6Q", blob[5:53])
    intro, main, header, lang, coda, perm = lens
    assert header > 0 and lang > 0
    assert perm == 0  # ids strictly increasing -> id-sort mode
    # entity + header extraction shrinks main vs raw article text
    raw_articles = len(data) - intro - coda
    assert main < raw_articles


def test_permutation_fallback_on_nonmonotonic_ids():
    # swap ids so they are not strictly increasing -> permutation section
    data = _corpus().replace(b"<id>10</id>", b"<id>99</id>", 1)
    blob = wiki.encode(data)
    assert blob[4] & 2  # perm flag
    assert wiki.decode(blob) == data


def test_stored_fallback_on_non_wiki_input():
    data = b"just some plain text\nwith no pages at all\n" * 10
    blob = wiki.encode(data)
    assert blob[4] & 1  # stored flag
    assert wiki.decode(blob) == data


def test_control_bytes_and_markers_escape():
    # article text containing the coder's own control bytes and fake markers
    evil = [
        "binary\x01\x02\x03\x04\x05\x06\x07\x08\x0bstuff",
        "\x0b",
        "lines pretending: &amp; &quot; &#960;",
        "[[de:Fake]]",
    ]
    data = (INTRO + _page(1, "Evil", evil) + CODA).encode()
    blob = wiki.encode(data)
    assert wiki.decode(blob) == data


def test_header_raw_fallbacks():
    # multiline-ish / attribute-carrying header lines must fall back raw
    page = _page(30, "Odd", ["text body"]).replace(
        "      <contributor>",
        "      <comment deleted=\"deleted\" />\n      <contributor>",
    ).replace(
        "      <timestamp>2004-06-12T09:33:17Z</timestamp>",
        "      <timestamp>2004-6-12T09:33:17Z</timestamp>",  # malformed
    )
    data = (INTRO + page).encode()
    blob = wiki.encode(data)
    assert wiki.decode(blob) == data


def test_empty_and_tiny_inputs():
    assert wiki.decode(wiki.encode(b"")) == b""
    assert wiki.decode(wiki.encode(b"x")) == b"x"
    assert wiki.decode(wiki.encode(b"  <page>\n")) == b"  <page>\n"


def test_id_delta_coding_compacts():
    """Sequential page ids delta-code to tiny entries in the header stream."""
    pages = "".join(
        _page(1000 + i, f"Page {i}", [f"body of page {i}"]) for i in range(50)
    )
    data = (INTRO + pages).encode()
    blob = wiki.encode(data)
    assert wiki.decode(blob) == data
    import struct

    header_len = struct.unpack("<6Q", blob[5:53])[2]
    # ~13 header lines/page compact to ~65 bytes (vs ~330 raw)
    assert header_len < 50 * 80
