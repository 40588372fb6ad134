"""The enwik-like corpus generator + full preprocessing chain.

Real enwik data is unobtainable in this environment (zero egress, no copy
on disk), so the dump-shaped fixture comes from tools/make_wiki_corpus.py -
deterministic, structured like a MediaWiki export (ids/timestamps/
contributors/redirects/entities/lang-links), with english.dic Zipfian body
text. These tests pin that the STARLIT-equivalent wikiprep and the
dictionary transform are exactly reversible on it, and that the full
wiki -> dict -> codec -> inverse chain is byte-identical end to end
(reference flow: src/runner/enwik9-prep.cpp:50-75 + gmix -c/-d).
"""
import struct
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gmix_tpu as g
from gmix_tpu.preprocess import dictionary as D
from gmix_tpu.preprocess import wiki
from tools.make_wiki_corpus import make_corpus


def _corpus():
    return make_corpus(60000, seed=7)


def test_generator_is_deterministic_and_dump_shaped():
    a, b = _corpus(), _corpus()
    assert a == b
    assert a.startswith(b"<mediawiki")
    assert a.count(b"<page>") > 10
    assert b"#REDIRECT" in a or len(a) < 100000  # redirects appear at scale
    assert b"&quot;" in a and b"<timestamp>" in a


def test_wikiprep_reversible_on_generated_dump():
    data = _corpus()
    blob = wiki.encode(data)
    assert wiki.decode(blob) == data
    intro, main, header, lang, coda, perm = struct.unpack("<6Q", blob[5:53])
    assert header > 0  # page headers actually extracted
    assert main < len(data)  # transform shrinks the article body


def test_dictionary_reversible_on_wiki_output():
    data = _corpus()
    wblob = wiki.encode(data)
    d = D.load(None)
    dblob = d.encode(wblob)
    assert d.decode(dblob) == wblob
    # english body text must actually hit the dictionary
    assert len(dblob) < 0.8 * len(wblob)


def test_full_chain_byte_identical_small():
    data = _corpus()[:4000]
    wblob = wiki.encode(data)
    d = D.load(None)
    dblob = d.encode(wblob)
    spec = g.tiny_spec(with_lstm=False)
    blob = g.compress_bytes(dblob, spec, num_streams=2, chunk=200)
    out = g.decompress_bytes(blob, spec, chunk=200)
    assert wiki.decode(d.decode(out)) == data
