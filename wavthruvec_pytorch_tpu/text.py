"""Text frontend: char -> id against the AISHELL-3 vocab string.

Reference behavior (text2vec/text.py:6-21): the vocab file is a single line
whose characters are the symbols; index = position in the string.  Encoding
drops unknown chars, prepends ``' '`` and appends ``'E'``.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

# Token constants (reference: text2vec/Constants.py:1-9)
PAD = 0
UNK = 1
BOS = 2
EOS = 3
PAD_WORD = "<blank>"
UNK_WORD = "<unk>"
BOS_WORD = "<s>"
EOS_WORD = "</s>"


class TextFrontend:
    def __init__(self, symbols: str):
        self.symbols = symbols
        self._symbol_to_id = {s: i for i, s in enumerate(symbols)}
        self._id_to_symbol = {i: s for i, s in enumerate(symbols)}

    @classmethod
    def from_vocab_file(cls, vocab_path: str) -> "TextFrontend":
        with open(vocab_path, "r", encoding="utf-8") as fr:
            symbols = fr.readline()
        return cls(symbols)

    @property
    def vocab_size(self) -> int:
        return len(self.symbols)

    def text_to_sequence(
        self,
        text: str,
        add_eos_to_text: bool = True,
        prepend_space_to_text: bool = True,
    ) -> List[int]:
        # unknown chars are silently dropped (reference: text.py:13)
        seq = [self._symbol_to_id[s] for s in text if s in self._symbol_to_id]
        if prepend_space_to_text:
            seq.insert(0, self._symbol_to_id[" "])
        if add_eos_to_text:
            seq.append(self._symbol_to_id["E"])
        return seq

    def sequence_to_text(self, seq: Sequence[int]) -> str:
        return "".join(self._id_to_symbol[int(i)] for i in seq)

    def encode_batch(self, texts: Sequence[str], pad_to: int | None = None):
        """Encode + right-pad a batch to a static length (host-side numpy)."""
        seqs = [self.text_to_sequence(t) for t in texts]
        max_len = max(len(s) for s in seqs)
        if pad_to is not None:
            if pad_to < max_len:
                raise ValueError(f"pad_to={pad_to} < longest text {max_len}")
            max_len = pad_to
        out = np.zeros((len(seqs), max_len), dtype=np.int32)
        lengths = np.zeros((len(seqs),), dtype=np.int32)
        for i, s in enumerate(seqs):
            out[i, : len(s)] = s
            lengths[i] = len(s)
        return out, lengths


def build_vocab_from_texts(texts: Sequence[str]) -> str:
    """Vocab = 'PE ' + every observed char (reference: prepare_data.py:100-114)."""
    symbols = "PE "
    seen = set(symbols)
    for t in texts:
        for ch in t:
            if ch not in seen:
                seen.add(ch)
                symbols += ch
    return symbols
