"""English text <-> id sequence codec with ARPAbet curly-brace escapes.

Behavioral parity target: `/root/reference/pytorch_sound/data/eng_handler/__init__.py:16-54`
(Tacotron-style).  ``text_to_sequence("hi {HH AY1}", ['english_cleaners'])``
cleans plain-text spans and encodes ``{...}`` spans as '@'-prefixed ARPAbet.
"""

import re
from typing import List

from pytorch_sound_tpu.data.eng_handler import cleaners
from pytorch_sound_tpu.data.eng_handler.symbols import symbols

_symbol_to_id = {s: i for i, s in enumerate(symbols)}
_id_to_symbol = {i: s for i, s in enumerate(symbols)}

_curly_re = re.compile(r'(.*?)\{(.+?)\}(.*)')


def text_to_sequence(text: str, cleaner_names: List[str]) -> List[int]:
    """Convert text to a list of symbol ids, running the named cleaners over
    plain-text spans and treating ``{...}`` spans as ARPAbet."""
    sequence: List[int] = []
    while text:
        m = _curly_re.match(text)
        if not m:
            sequence += _symbols_to_sequence(_clean_text(text, cleaner_names))
            break
        sequence += _symbols_to_sequence(_clean_text(m.group(1), cleaner_names))
        sequence += _arpabet_to_sequence(m.group(2))
        text = m.group(3)
    return sequence


def sequence_to_text(sequence: List[int]) -> str:
    """Inverse of :func:`text_to_sequence`; ARPAbet ids are re-wrapped in braces."""
    result = ''
    for symbol_id in sequence:
        if symbol_id in _id_to_symbol:
            s = _id_to_symbol[symbol_id]
            if len(s) > 1 and s[0] == '@':
                s = '{%s}' % s[1:]
            result += s
    return result.replace('}{', ' ')


def _clean_text(text: str, cleaner_names: List[str]) -> str:
    for name in cleaner_names:
        cleaner = getattr(cleaners, name, None)
        if cleaner is None:
            raise ValueError('Unknown cleaner: %s' % name)
        text = cleaner(text)
    return text


def _symbols_to_sequence(syms) -> List[int]:
    return [_symbol_to_id[s] for s in syms if _should_keep_symbol(s)]


def _arpabet_to_sequence(text: str) -> List[int]:
    return _symbols_to_sequence(['@' + s for s in text.split()])


def _should_keep_symbol(s: str) -> bool:
    return s in _symbol_to_id and s not in ('_', '~')
