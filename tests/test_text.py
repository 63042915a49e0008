"""Text frontend tests: settings vocab, cleaners, number expansion, codecs, Korean g2p."""

import numpy as np

from pytorch_sound_tpu import settings
from pytorch_sound_tpu.data.eng_handler import text_to_sequence, sequence_to_text
from pytorch_sound_tpu.data.eng_handler.cleaners import english_cleaners
from pytorch_sound_tpu.data.eng_handler.numbers import normalize_numbers
from pytorch_sound_tpu.data.korean.g2p import KoG2P, graph2phone
from pytorch_sound_tpu.utils import text as text_utils


def test_vocab_sizes_match_reference():
    # reference: symbols = pad + '-' + 10 punct + 52 letters = 64
    assert settings.ENG_VOCA_SIZE == 64
    assert settings.KOR_PHN_SIZE == 47
    assert settings.KOR_GRP_SIZE == 63


def test_english_cleaners():
    assert english_cleaners('Dr.  Smith owes  $3.50!') == \
        'doctor smith owes three dollars, fifty cents!'
    assert english_cleaners('Café 1984') == 'cafe nineteen eighty-four'


def test_normalize_numbers():
    assert normalize_numbers('12') == 'twelve'
    # 1000 < n < 3000 uses year-style two-digit grouping (reference behavior)
    assert normalize_numbers('1,234') == 'twelve thirty-four'
    assert normalize_numbers('5,234') == 'five thousand two hundred thirty-four'
    assert normalize_numbers('3.14') == 'three point fourteen'
    assert normalize_numbers('2nd') == 'second'
    assert normalize_numbers('21st') == 'twenty-first'
    assert normalize_numbers('2000') == 'two thousand'
    assert normalize_numbers('2005') == 'two thousand five'
    assert normalize_numbers('£5') == 'five pounds'
    assert normalize_numbers('100') == 'one hundred'


def test_text_to_sequence_roundtrip():
    seq = text_to_sequence('hello world.', ['basic_cleaners'])
    assert sequence_to_text(seq) == 'hello world.'
    assert all(0 < i < settings.ENG_VOCA_SIZE for i in seq)


def test_arpabet_braces():
    seq = text_to_sequence('turn {HH AW1 S} left', ['english_cleaners'])
    # arpabet ids are outside the exported vocab -> dropped, but must not crash
    assert isinstance(seq, list)


def test_eng_t2i_appends_eos():
    arr = text_utils.eng_t2i('abc')
    assert arr[-1] == settings.ENG_VOCA_SIZE
    assert isinstance(arr, np.ndarray)


def test_graph2phone_basic():
    # 한국: h0 aa nf - k0 uu kf
    assert graph2phone('한국') == 'h0aanf-k0uukf'
    # silent onset dropped, coda ieung -> ng
    assert graph2phone('아') == 'aa'
    assert graph2phone('강') == 'k0aang'


def test_kog2p_core_rules():
    g2p = KoG2P()
    # h-aspiration: 좋다 -> [조타]
    assert g2p.g2p('좋다').split() == ['c0', 'oo', 'th', 'aa']
    # nasalization: 국민 -> [궁민]
    assert g2p.g2p('국민').split() == ['k0', 'uu', 'ng', 'mm', 'ii', 'nf']
    # palatalization: 같이 -> [가치]
    assert g2p.g2p('같이').split() == ['k0', 'aa', 'ch', 'ii']
    # liaison: 옷이 -> [오시]
    assert g2p.g2p('옷이').split() == ['oo', 's0', 'ii']
    # liquid assimilation: 신라 -> [실라]
    assert g2p.g2p('신라').split() == ['s0', 'ii', 'll', 'rr', 'aa']
    # tensification: 학교 -> [학꾜]
    assert g2p.g2p('학교').split() == ['h0', 'aa', 'kf', 'kk', 'yo']


def test_kor_codecs_roundtrip():
    phones = 'k0 aa ch ii'
    idx = text_utils.kor_p2i(phones)
    assert text_utils.kor_i2p(idx) == phones.split()
    grp = text_utils.kor_text2grp('한글')
    idx = text_utils.kor_g2i(grp)
    assert len(idx) == 6  # 2 syllables x 3 jamo


def test_kog2p_full_rulebook_golden():
    """Default rulebook is the vendored full KoG2P book; outputs verified
    against the upstream engine run on the same rules (incl. lexical
    exceptions the core book lacks: 물고기, 닭, n-insertion 신여성)."""
    g2p = KoG2P()
    golden = {
        '학교에 갑니다': 'h0 aa kf kk yo ee k0 aa mf nn ii t0 aa',
        '안녕하세요': 'aa nf nn yv ng h0 aa s0 ee yo',
        '같이 읽어요': 'k0 aa ch ii ii ll k0 vv yo',
        '물고기': 'mm uu ll kk oo k0 ii',
        '좋은 날씨네요': 'c0 oo xx nf nn aa ll ss ii nn ee yo',
        '신여성': 's0 ii nf nn yv s0 vv ng',
        '값이 비싸요': 'k0 aa pf ss ii p0 ii ss aa yo',
        '한국어 음성 합성': 'h0 aa nf k0 uu k0 vv xx mf s0 vv ng h0 aa pf ss vv ng',
        '몇 리': 'mm yv tf rr ii',
        '닭고기와 밥': 't0 aa kf kk oo k0 ii wa p0 aa pf',
    }
    for text, expected in golden.items():
        assert g2p.g2p(text) == expected, text


def test_kophn_dict_matches_phoneme_inventory():
    """assets/kophn_dict.txt (used by zeroth_korean.check_phn_dict consumers)
    is exactly the non-pad phone inventory."""
    import os
    from pytorch_sound_tpu.data.korean import PHONEMES
    path = os.path.join(os.path.dirname(__file__), '..', 'assets', 'kophn_dict.txt')
    phones = open(path).read().split()
    assert phones == sorted(p for p in PHONEMES if p != '_')


def test_kog2p_classic_aliases():
    """The classic KoG2P script surface (camelCase) is importable and works."""
    from pytorch_sound_tpu.data.korean.g2p import (
        DEFAULT_RULEBOOK_PATH, addPhoneBoundary, addSpace, checkCharType,
        isHangul, phone2prono, readRules)
    ri, ro = readRules(DEFAULT_RULEBOOK_PATH)
    assert len(ri) == len(ro) > 50
    assert isHangul(ord('학')) and not isHangul(ord('A'))
    assert checkCharType([ord('학'), 32, ord('A')]) == [0, 1, -1]
    assert addSpace('p0aa') == 'p0 aa'
    assert addPhoneBoundary('p0aa').count(',') == 2
    assert isinstance(phone2prono('p0aa,', ri, ro), str)
