"""Caption tokenization and vocabulary.

= the text machinery of datasets.py: RegexpTokenizer(r'\\w+') + lowercase +
ascii-filter (datasets.py:335-367), insertion-order dictionary with
'<end>'=0 (datasets.py:369-407), pad/truncate-with-sorted-random-subsample
caption encoding (datasets.py:459-477), stopword- and color-word-filtered
caption variants (datasets.py:597-692).
"""

from __future__ import annotations

import functools
import re
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_WORD_RE = re.compile(r"\w+")

# The reference's color filter uses the nonstandard `nltk.corpus.color`
# (datasets.py:641); this explicit list covers the same common color terms.
COLOR_WORDS = frozenset(
    "red orange yellow green blue purple pink brown black white grey gray "
    "golden gold silver beige tan cream ivory maroon navy teal cyan magenta "
    "violet indigo turquoise olive crimson scarlet azure".split()
)


@functools.lru_cache(maxsize=1)
def _stopwords() -> frozenset:
    # cached: tokenize_caption calls this per caption, and the nltk corpus
    # read + frozenset build is ~100k x wasted work on a full CUB scan
    try:
        from nltk.corpus import stopwords

        return frozenset(stopwords.words("english"))
    except Exception:
        # minimal built-in fallback (nltk data may be absent)
        return frozenset(
            "a an the and or but if then this that these those is are was "
            "were be been being have has had do does did of in on at to "
            "from with for by as it its his her their our your my i you he "
            "she they we".split()
        )


def tokenize_caption(cap: str, no_stopwords: bool = False,
                     only_color: bool = False) -> List[str]:
    """RegexpTokenizer(r'\\w+') + lower + ascii filter (datasets.py:346-358),
    with the test1.py:22-24 stopword/color-word options."""
    cap = cap.replace("��", " ")
    tokens = _WORD_RE.findall(cap.lower())
    out = []
    sw = _stopwords() if no_stopwords else None
    for t in tokens:
        t = t.encode("ascii", "ignore").decode("ascii")
        if not t:
            continue
        if no_stopwords and t in sw:
            continue
        if only_color and t not in COLOR_WORDS:
            continue
        out.append(t)
    return out


@dataclass
class Vocab:
    ixtoword: Dict[int, str]
    wordtoix: Dict[str, int]

    @property
    def n_words(self) -> int:
        return len(self.ixtoword)

    def encode_tokens(self, tokens: Sequence[str]) -> List[int]:
        return [self.wordtoix[w] for w in tokens if w in self.wordtoix]

    def decode(self, ids: Sequence[int]) -> List[str]:
        return [self.ixtoword[int(i)] for i in ids if int(i) in self.ixtoword]


def build_dictionary(
    train_captions: List[List[str]], test_captions: List[List[str]]
) -> Tuple[List[List[int]], List[List[int]], Vocab]:
    """Insertion-order vocabulary over train+test with '<end>'=0
    (= datasets.py:369-407; the >=0 count filter keeps every word)."""
    word_counts: Dict[str, float] = defaultdict(float)
    for sent in train_captions + test_captions:
        for w in sent:
            word_counts[w] += 1
    ixtoword = {0: "<end>"}
    wordtoix = {"<end>": 0}
    for ix, w in enumerate(word_counts, start=1):
        wordtoix[w] = ix
        ixtoword[ix] = w
    vocab = Vocab(ixtoword, wordtoix)
    enc = lambda caps: [vocab.encode_tokens(t) for t in caps]
    return enc(train_captions), enc(test_captions), vocab


def encode_caption(
    sent_ids: Sequence[int], words_num: int,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, int]:
    """Pad to words_num with 0 ('<end>'); if longer, keep a random sorted
    subsample (= get_caption, datasets.py:459-477). Returns ([words_num],
    length)."""
    sent = np.asarray(sent_ids, np.int64)
    x = np.zeros((words_num,), np.int64)
    n = len(sent)
    if n <= words_num:
        x[:n] = sent
        return x, max(n, 1)
    rng = rng or np.random.default_rng()
    ix = np.sort(rng.permutation(n)[:words_num])
    x[:] = sent[ix]
    return x, words_num


def encode_batch(
    caption_ids: Sequence[Sequence[int]], words_num: int,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch of encoded captions -> (tokens [B, T], lens [B])."""
    toks = np.zeros((len(caption_ids), words_num), np.int32)
    lens = np.zeros((len(caption_ids),), np.int32)
    for i, c in enumerate(caption_ids):
        t, l = encode_caption(c, words_num, rng)
        toks[i] = t
        lens[i] = l
    return toks, lens
