"""Mention detection + masked-sentence generation (pure functions, no Ray).

Semantics follow the reference exactly:
* marker parsing       — /root/reference/ensemble/utils/common.py:66-79
* masked-sentence gen  — /root/reference/ensemble/utils/common.py:15-54
* CI singleton gen     — /root/reference/batched_main_NER.py:338-373
* common-span filter   — /root/reference/ensemble/utils/common.py:82-113

The unit of work is one sentence; terms are (word, tag) pairs — the
reference's 5-field TSV rows only ever read WORD_POS=1 and TAG_POS=2
(/root/reference/ensemble/utils/common.py:4-5).
"""

from __future__ import annotations

MASK_TAG = "__entity__"
INPUT_MASK_TAG = ":__entity__"
RESET_POS_TAG = "RESET"
# reference ensemble/utils/common.py:11
NOUN_TAGS = ["NFP", "JJ", "NN", "FW", "NNS", "NNPS", "JJS", "JJR", "NNP", "POS", "CD"]
_NOUN_SET = frozenset(NOUN_TAGS)

CI_TEMPLATE = "%s is a entity"  # reference batched_main_NER.py:339


def parse_marked_terms(sentence: str) -> list[tuple[str, str]]:
    """``w:__entity__`` markers -> (word, noun-tag) pairs; others RESET.

    Mirrors ``set_POS_based_on_entities`` (common.py:66-79): marked words get
    the first noun tag, the marker suffix is *globally* replaced.
    """
    terms = []
    for word in sentence.split():
        if word.endswith(INPUT_MASK_TAG):
            terms.append((word.replace(INPUT_MASK_TAG, ""), NOUN_TAGS[0]))
        else:
            terms.append((word, RESET_POS_TAG))
    return terms


# POS-lite fallback for UNMARKED sentences.  The reference falls back to an
# external jPTDP POS service when a sentence has no ``:__entity__`` markers
# (/root/reference/main_NER.py:225-230); the engine ships a deterministic
# closed-class heuristic behind the same seam (a real POS model can be
# plugged in via the ``pos_backend`` parameter of tagger.tag_sentence).
_FUNCTION_WORDS = frozenset(
    """a an the this that these those is are was were be been being am
    do does did done has have had having will would shall should can could
    may might must and or but nor so yet if then than as of in on at by for
    with from to into onto over under about after before between during
    through up down out off above below again further once here there when
    where why how all any both each few more most other some such no not
    only own same too very s t don now he she it they we you i his her hers
    its their theirs our ours your yours my mine me him them us who whom
    whose which what said says say went gets got get made make makes""".split()
)
import re as _re

_PUNCT_ONLY = _re.compile(r"^\W+$", _re.UNICODE)
_EDGE_PUNCT = _re.compile(r"^\W+|\W+$", _re.UNICODE)


def heuristic_pos_terms(sentence: str) -> list[tuple[str, str]]:
    """Unmarked sentence -> (word, tag) pairs without a POS model: pure
    punctuation and closed-class function words get RESET, numerics get CD,
    every other content word gets a noun tag (maximal content-word runs then
    become candidate entity spans, same downstream flow as the marker path).
    Deterministic and vocabulary-free — recall over real verbs is imperfect
    by construction; swap in a real POS backend for production tagging."""
    terms = []
    for word in sentence.split():
        core = _EDGE_PUNCT.sub("", word)
        if not core or _PUNCT_ONLY.match(word):
            terms.append((word, RESET_POS_TAG))
        elif core.lower() in _FUNCTION_WORDS:
            terms.append((word, RESET_POS_TAG))
        elif core.replace(",", "").replace(".", "").isdigit():
            terms.append((word, "CD"))
        else:
            terms.append((word, "NN"))
    return terms


def detect_terms(sentence: str, pos_backend=None) -> list[tuple[str, str]]:
    """The reference's mode switch (main_NER.py:225-230): marker-driven when
    the sentence carries ``:__entity__`` tags, POS-driven otherwise."""
    if INPUT_MASK_TAG in sentence:
        return parse_marked_terms(sentence)
    if pos_backend is not None:
        return pos_backend(sentence)
    return heuristic_pos_terms(sentence)


def generate_masked_sentences(terms: list[tuple[str, str]]) -> tuple[list[list[str]], list[int]]:
    """Per maximal run of noun-tagged tokens emit one sentence copy with the
    run replaced by ``__entity__``; span flags mark run membership.

    Mirrors ``generate_masked_sentences``/``gen_sentence`` (common.py:15-54).
    """
    size = len(terms)
    sentence_arr: list[list[str]] = []
    span_arr: list[int] = []
    i = 0
    while i < size:
        if terms[i][1] in _NOUN_SET:
            # gen_sentence: prefix words, mask, suffix words
            skip = 0
            j = i
            while j < size and terms[j][1] in _NOUN_SET:
                skip += 1
                j += 1
            new_sent = [t[0] for t in terms[:i]]
            new_sent.append(MASK_TAG)
            new_sent.extend(t[0] for t in terms[i + skip:])
            sentence_arr.append(new_sent)
            span_arr.extend([1] * skip)
            i += skip
        else:
            span_arr.append(0)
            i += 1
    return sentence_arr, span_arr


def masked_word_first_letter_capitalize(entity: str) -> str:
    """Uppercase the first letter of all-lowercase words
    (reference batched_main_NER.py:327-335)."""
    ret = []
    for term in entity.split():
        if len(term) > 1 and term[0].islower() and term[1].islower():
            ret.append(term[0].upper() + term[1:])
        else:
            ret.append(term)
    return " ".join(ret)


def span_phrases(terms: list[tuple[str, str]], span_arr: list[int]) -> list[str]:
    """The raw phrase (space-joined words) of each span run, in order."""
    phrases = []
    i = 0
    while i < len(span_arr):
        if span_arr[i] == 1:
            words = []
            while i < len(span_arr) and span_arr[i] == 1:
                words.append(terms[i][0])
                i += 1
            phrases.append(" ".join(words))
        else:
            i += 1
    return phrases


def gen_ci_sentences(terms: list[tuple[str, str]], span_arr: list[int]) -> list[str]:
    """Per span: capitalized phrase + ``"%s is a entity"`` template
    (reference batched_main_NER.py:338-373)."""
    return [
        CI_TEMPLATE % masked_word_first_letter_capitalize(p)
        for p in span_phrases(terms, span_arr)
    ]


def filter_common_noun_spans(
    span_arr: list[int],
    masked_sent_arr: list[list[str]],
    terms: list[tuple[str, str]],
    common_descs: frozenset[str] | set[str],
) -> tuple[list[list[str]], list[int]]:
    """Drop spans whose every token is in the stoplist; zero their flags.

    Mirrors ``filter_common_noun_spans`` (common.py:82-113).  No-op with the
    default empty stoplist (reference untagged_terms.txt is empty).
    """
    if not common_descs:
        return masked_sent_arr, span_arr
    ret_span_arr = list(span_arr)
    ret_masked: list[list[str]] = []
    sent_index = 0
    i = 0
    while i < len(span_arr):
        if span_arr[i] == 1:
            start = i
            is_all_common = True
            while i < len(span_arr) and span_arr[i] == 1:
                if terms[i][0].lower() not in common_descs:
                    is_all_common = False
                i += 1
            if is_all_common:
                for j in range(start, i):
                    ret_span_arr[j] = 0
            else:
                ret_masked.append(masked_sent_arr[sent_index])
            sent_index += 1
        else:
            i += 1
    return ret_masked, ret_span_arr


def is_blank_entity_sentence(sentence: str) -> bool:
    """Sentence of the form ``"... :__entity__"`` (empty-context CI harvest
    probe) — CI pooling is suppressed for these
    (reference batched_main_NER.py:158-163; the reference checks the
    newline-terminated file line, we check the stripped sentence)."""
    return sentence.rstrip("\n").endswith(" " + INPUT_MASK_TAG)
