"""Small parsers / normalizers from the reference (SURVEY.md §2.2).

These complete operator-inventory parity for the v1 text-protocol path and
the ensemble ingress; each is a pure function used inside map_batches when
the corresponding backend protocol is selected.
"""

from __future__ import annotations

DESC_HEAD = "PIVOT_DESCRIPTORS:"  # reference main_NER.py:17


def extract_pos_tsv(text: str) -> list[list[str]]:
    """POS-service text response -> rows of exactly 5 TSV fields
    (reference main_NER.py:79-96: skip the leading non-empty echo block,
    then keep 5-field lines)."""
    arr = text.split("\n")
    start_pos = 0
    for line in arr:
        if len(line) > 0:
            start_pos += 1
        else:
            break
    terms_arr = []
    for line in arr[start_pos:]:
        terms = line.split("\t")
        if len(terms) == 5:
            terms_arr.append(terms)
    return terms_arr


def extract_descs_v1(text: str) -> list[str]:
    """v1 descriptor-service text response -> interleaved flat array
    [desc1, score1, ...] from the ``PIVOT_DESCRIPTORS:`` line
    (reference main_NER.py:670-679)."""
    for line in text.split("\n"):
        if line.startswith(DESC_HEAD):
            terms = line.split(":")
            return " ".join(terms[1:]).strip().split()
    return []


def interleaved_to_descs(flat: list) -> list[dict]:
    """v1 interleaved [d1,v1,d2,v2,...] -> the structured descs contract
    (signatures resolved separately in v1 via the entity server; here the
    caller attaches e/e_count)."""
    assert len(flat) % 2 == 0
    return [
        {"desc": flat[i], "v": float(flat[i + 1])} for i in range(0, len(flat), 2)
    ]


def normalize_casing(sent: str) -> str:
    """First char kept, rest lowercased per word (reference
    ensemble/utils/common.py:115-124; defined twice there, called nowhere —
    kept for parity and available as an opt-in ingress map)."""
    out = []
    for word in sent.split():
        out.append(word[0] + word[1:].lower() if len(word) > 1 else word[0])
    return " ".join(out)


def add_term_punct(sent: str) -> str:
    """End every sentence with ``' . '`` when unpunctuated — ensemble
    ingress normalization (reference ensemble/aggregate_server_json.py:39-46,
    including the trailing space)."""
    if len(sent) > 1 and sent[-1] not in "!,.:;?":
        return sent + " . "
    return sent


def gen_ner_output_lines(ensembled_ner: dict[str, dict]) -> str:
    """Ensembled result -> ``term e`` lines + blank separator (the
    reference's NER-output sink, aggregate_server_json.py:548-556)."""
    lines = [
        f"{node['term']} {node['e']}\n" for node in ensembled_ner.values()
    ]
    return "".join(lines) + "\n"
