"""Dictionary transform: roundtrip + python/native differential tests."""
import os

import pytest

from gmix_tpu.preprocess import dictionary as D

DICT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gmix_tpu", "assets", "english.dic",
)

SAMPLES = [
    b"",
    b"the quick brown Fox jumps over the LAZY dog",
    b"Hello, World! HELLO WORLD. MiXeD case words",
    b"&quot;quoted&quot; text with &quot;",
    b"bytes: \x00\x01\x07\x06\x0c\x08\x40\x80\xff\xd0\xf0 end",
    b"supercalifragilisticexpialidocious antidisestablishmentarianism",
    b"UPPERCASE RUNS then lower tail ABCdef",
    b"a" * 100 + b" " + b"Z" * 50,
    b"internationalization\nlocalization\nfoo",
]


@pytest.fixture(scope="module")
def pydict():
    if not os.path.exists(DICT_PATH):
        pytest.skip("dictionary asset unavailable")
    return D.Dictionary(open(DICT_PATH, "rb").read())


@pytest.fixture(scope="module")
def ndict():
    if not os.path.exists(DICT_PATH):
        pytest.skip("dictionary asset unavailable")
    try:
        return D.NativeDictionary(open(DICT_PATH, "rb").read())
    except RuntimeError:
        pytest.skip("native engine unavailable")


@pytest.mark.parametrize("i", range(len(SAMPLES)))
def test_python_roundtrip(pydict, i):
    data = SAMPLES[i]
    assert pydict.decode(pydict.encode(data)) == data


def test_python_roundtrip_corpus(pydict):
    data = open("/root/repo/data/corpus_100k.bin", "rb").read()[:20000]
    enc = pydict.encode(data)
    assert pydict.decode(enc) == data
    # a word list should shrink under a word-replacing transform
    assert len(enc) < len(data)


def test_native_matches_python(pydict, ndict):
    for data in SAMPLES:
        assert ndict.encode(data) == pydict.encode(data)
        assert ndict.decode(ndict.encode(data)) == data


def test_native_corpus(pydict, ndict):
    data = open("/root/repo/data/corpus_100k.bin", "rb").read()[:50000]
    enc_n = ndict.encode(data)
    assert enc_n == pydict.encode(data[: len(data)])
    assert ndict.decode(enc_n) == data
