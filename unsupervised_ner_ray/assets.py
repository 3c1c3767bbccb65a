"""Broadcast-small side data: entity type system, precedence lists, vocabulary.

The consolidation map mirrors the reference type system
(/root/reference/entity_types_consolidated.txt:1-21, loader semantics
/root/reference/main_NER.py:38-56): 88 subtype entries consolidating into 21
broad groups.  It is expressed here as a ``group -> [subtypes]`` literal (a
different artifact shape from the reference's flat text file; the semantics —
subtype->group lookup with every group also mapping to itself — are identical).

The descriptor vocabulary is a deterministic synthetic stand-in for the
reference's ~100 human-labeled files under /root/reference/ner_labeling/
(format ``term TYPE``, merge semantics ner_labeling/construct_bs.py:16-59).
No label file is copied; a small seed set of surface forms is taken from the
reference's own canned test sentences (batched_main_NER.py:837-876,
ensemble/aggregate_server_json.py:573-719) and the rest are generated
deterministically per subtype so the mock scorer backend has a stable
descriptor universe.
"""

from __future__ import annotations

import hashlib

# group -> subtypes (reference entity_types_consolidated.txt:1-21)
ENTITY_GROUPS: dict[str, list[str]] = {
    "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE": [
        "DRUG", "CHEMICAL_SUBSTANCE", "HAZARDOUS_OR_POISONOUS_SUBSTANCE",
        "ESTABLISHED_PHARMACOLOGIC_CLASS", "CHEMICAL_CLASS", "VITAMIN",
        "LAB_PROCEDURE", "SURGICAL_AND_MEDICAL_PROCEDURES",
        "DIAGNOSTIC_PROCEDURE", "LAB_TEST_COMPONENT", "STUDY", "DRUG_ADJECTIVE",
    ],
    "DISEASE": [
        "MENTAL_OR_BEHAVIORAL_DYSFUNCTION", "CONGENITAL_ABNORMALITY",
        "CELL_OR_MOLECULAR_DYSFUNCTION", "DISEASE_ADJECTIVE",
    ],
    "GENE": [
        "PROTEIN", "ENZYME", "VIRAL_PROTEIN", "RECEPTOR", "PROTEIN_FAMILY",
        "MOUSE_PROTEIN_FAMILY", "MOUSE_GENE", "NUCLEOTIDE_SEQUENCE",
        "GENE_EXPRESSION_ADJECTIVE",
    ],
    "BODY_PART_OR_ORGAN_COMPONENT": [
        "BODY_LOCATION_OR_REGION", "BODY_SUBSTANCE", "CELL", "CELL_LINE",
        "CELL_COMPONENT", "BIO_MOLECULE", "METABOLITE", "HORMONE",
        "BODY_ADJECTIVE",
    ],
    "ORGANISM_FUNCTION": [
        "ORGAN_OR_TISSUE_FUNCTION", "PHYSIOLOGIC_FUNCTION", "CELL_FUNCTION",
        "FUNCTION_ADJECTIVE",
    ],
    "BIO": ["SPECIES", "BACTERIUM", "VIRUS", "BIO_ADJECTIVE"],
    "OBJECT": ["PRODUCT", "MEDICAL_DEVICE", "DEVICE", "PRODUCT_ADJECTIVE"],
    "MEASURE": ["NUMBER", "TIME", "SEQUENCE", "MEASURE_ADJECTIVE"],
    "PERSON": ["PERSON_ADJECTIVE"],
    "ORGANIZATION": ["UNIV", "GOV", "EDU", "ORGANIZATION_ADJECTIVE"],
    "ENT": ["SPORT", "MOV", "MUSIC", "ENT_ADJECTIVE"],
    "LOCATION": ["LOCATION_ADJECTIVE"],
    "SOCIAL_CIRCUMSTANCES": ["RELIGION", "SOCIAL_CIRCUMSTANCES_ADJECTIVE"],
    "COLOR": ["COLOR_ADJECTIVE"],
    "LANGUAGE": ["LANGUAGE_ADJECTIVE"],
    "GRAMMAR_CONSTRUCT": [],
    "LEGAL": ["LEGAL_ADJECTIVE"],
    "POLITICS": ["POLITICS_ADJECTIVE"],
    "SOFTWARE": ["SOFTWARE_ADJECTIVE"],
    "OTHER": [],
    "UNTAGGED_ENTITY": [],
}


def build_entity_map() -> dict[str, str]:
    """subtype -> consolidated group; groups map to themselves.

    Mirrors ``read_entity_map`` (/root/reference/main_NER.py:38-56) including
    the duplicate-subtype assertion.
    """
    emap: dict[str, str] = {}
    for group, subtypes in ENTITY_GROUPS.items():
        if group not in emap:
            emap[group] = group
        for st in subtypes:
            assert st not in emap, f"duplicate subtype {st}"
            emap[st] = group
    return emap


# Ensemble precedence lists (reference ensemble/config.json:2-33).
BIO_PRECEDENCE = [
    "THERAPEUTIC_OR_PREVENTIVE_PROCEDURE", "DISEASE", "GENE",
    "BODY_PART_OR_ORGAN_COMPONENT", "BIO", "ORGANISM_FUNCTION",
]
PHI_PRECEDENCE = [
    "PERSON", "ORGANIZATION", "ENT", "COLOR", "LANGUAGE",
    "GRAMMAR_CONSTRUCT", "LOCATION", "SOCIAL_CIRCUMSTANCES", "LEGAL",
    "POLITICS", "SOFTWARE",
]
COMMON_ENTITIES = [
    "UNTAGGED_ENTITY", "OTHER", "GRAMMAR_CONSTRUCT", "OBJECT", "MEASURE",
    "LOCATION",
]

SERVERS_CONFIG = [
    {"name": "bio", "precedence": BIO_PRECEDENCE, "common": COMMON_ENTITIES},
    {"name": "phi", "precedence": PHI_PRECEDENCE, "common": COMMON_ENTITIES},
]


# Seed surface forms drawn from the reference's own canned test sentences
# (batched_main_NER.py:837-876; ensemble/aggregate_server_json.py:573-719).
# term -> list of (subtype, count).  Counts are arbitrary-but-fixed weights in
# the same role as the reference label-file occurrence counts.
_SEED_VOCAB: dict[str, list[tuple[str, int]]] = {
    "imatinib": [("DRUG", 24), ("CHEMICAL_SUBSTANCE", 11)],
    "mesylate": [("CHEMICAL_SUBSTANCE", 9), ("DRUG", 4)],
    "selegiline": [("CHEMICAL_SUBSTANCE", 12)],
    "dopa": [("CHEMICAL_SUBSTANCE", 7), ("BIO_MOLECULE", 3)],
    "asbestos": [("HAZARDOUS_OR_POISONOUS_SUBSTANCE", 14)],
    "ipilimumab": [("DRUG", 16)],
    "dasatinib": [("DRUG", 10)],
    "nilotinib": [("DRUG", 10)],
    "sunitinib": [("DRUG", 8)],
    "vaccine": [("DRUG", 9), ("THERAPEUTIC_OR_PREVENTIVE_PROCEDURE", 6)],
    "biopsy": [("DIAGNOSTIC_PROCEDURE", 13)],
    "mesothelioma": [("DISEASE", 18)],
    "parkinson's": [("DISEASE", 15), ("PERSON", 4)],
    "parkinsons": [("DISEASE", 13)],
    "hypophysitis": [("DISEASE", 9)],
    "leukemia": [("DISEASE", 12)],
    "tonsillitis": [("DISEASE", 8)],
    "pharyngitis": [("DISEASE", 7)],
    "apnea": [("DISEASE", 6)],
    "cancer": [("DISEASE", 22)],
    "nsclc": [("DISEASE", 9)],
    "aml": [("DISEASE", 8)],
    "cml": [("DISEASE", 8)],
    "flu": [("DISEASE", 10)],
    "dyspraxia": [("MENTAL_OR_BEHAVIORAL_DYSFUNCTION", 5)],
    "egfr": [("GENE", 11), ("PROTEIN", 8), ("LAB_TEST_COMPONENT", 5)],
    "foxp2": [("GENE", 9), ("MOUSE_GENE", 3)],
    "cftr": [("GENE", 8), ("PROTEIN", 5)],
    "urokinase": [("ENZYME", 7), ("DRUG", 3)],
    "kinase": [("ENZYME", 12), ("PROTEIN", 6)],
    "cdk": [("ENZYME", 5), ("GENE", 4)],
    "virus": [("VIRUS", 16)],
    "coronavirus": [("VIRUS", 14)],
    "bacteria": [("BACTERIUM", 10)],
    "marrow": [("BODY_PART_OR_ORGAN_COMPONENT", 8)],
    "bone": [("BODY_PART_OR_ORGAN_COMPONENT", 10)],
    "kidney": [("BODY_PART_OR_ORGAN_COMPONENT", 12)],
    "leg": [("BODY_LOCATION_OR_REGION", 9)],
    "heart": [("BODY_PART_OR_ORGAN_COMPONENT", 13)],
    "lung": [("BODY_PART_OR_ORGAN_COMPONENT", 11)],
    "hormones": [("HORMONE", 8)],
    "ajit": [("PERSON", 10)],
    "rajasekharan": [("PERSON", 8)],
    "fyodor": [("PERSON", 6)],
    "dostoevsky": [("PERSON", 7)],
    "gehrig": [("PERSON", 9), ("DISEASE", 3)],
    "lou": [("PERSON", 8)],
    "erdős": [("PERSON", 4)],
    "musk": [("PERSON", 9)],
    "elon": [("PERSON", 8)],
    "incaviglia": [("PERSON", 5)],
    "engineer": [("PERSON", 7), ("OTHER", 3)],
    "president": [("PERSON", 8), ("POLITICS", 4)],
    "nference": [("ORGANIZATION", 9)],
    "xcorp": [("ORGANIZATION", 7)],
    "pfizer": [("ORGANIZATION", 11)],
    "microbix": [("ORGANIZATION", 5)],
    "fifa": [("ORGANIZATION", 6), ("SPORT", 4)],
    "university": [("UNIV", 10)],
    "hofstra": [("UNIV", 4)],
    "tesla": [("ORGANIZATION", 10), ("PERSON", 3)],
    "apple": [("ORGANIZATION", 12), ("OBJECT", 4)],
    "seattle": [("LOCATION", 10)],
    "york": [("LOCATION", 14)],
    "new york": [("LOCATION", 15)],
    "boston": [("LOCATION", 9)],
    "miami": [("LOCATION", 8)],
    "beijing": [("LOCATION", 9)],
    "china": [("LOCATION", 12)],
    "italy": [("LOCATION", 9)],
    "japan": [("LOCATION", 9)],
    "europe": [("LOCATION", 10)],
    "cambridge": [("LOCATION", 7), ("UNIV", 4)],
    "wuhan": [("LOCATION", 5)],
    "houston": [("LOCATION", 7)],
    "alabama": [("LOCATION", 6)],
    "california": [("LOCATION", 11), ("ENT", 3)],
    "tamil": [("LANGUAGE", 6), ("SOCIAL_CIRCUMSTANCES", 2)],
    "jazz": [("MUSIC", 8)],
    "itunes": [("SOFTWARE", 7), ("PRODUCT", 4)],
    "ipod": [("PRODUCT", 8)],
    "iphone": [("PRODUCT", 9)],
    "two": [("NUMBER", 20)],
    "sixth": [("NUMBER", 7), ("SEQUENCE", 5)],
    "1880s": [("TIME", 6)],
    "december": [("TIME", 9)],
    "friday": [("TIME", 8)],
    "wednesday": [("TIME", 8)],
    "saturday": [("TIME", 8)],
    "black": [("COLOR", 9)],
    "omicron": [("VIRUS", 8), ("BIO", 4)],
    "covid-19": [("DISEASE", 14), ("VIRUS", 6)],
}


def build_vocab(extra_per_subtype: int = 12) -> dict[str, tuple[list[str], list[int]]]:
    """Descriptor vocabulary: lowercased term -> (subtypes, counts).

    Seed terms above plus ``extra_per_subtype`` generated filler descriptors
    per subtype (``<subtype-lower>_d<i>``), giving the mock scorer a stable,
    deterministic descriptor universe (role of the reference's merged
    bootstrap list, ner_labeling/construct_bs.py:33-59).
    """
    vocab: dict[str, tuple[list[str], list[int]]] = {}
    for term, pairs in _SEED_VOCAB.items():
        vocab[term] = ([p[0] for p in pairs], [p[1] for p in pairs])
    for group, subtypes in ENTITY_GROUPS.items():
        for st in [group] + subtypes:
            if st in ("OTHER", "UNTAGGED_ENTITY"):
                continue
            for i in range(extra_per_subtype):
                term = f"{st.lower()}_d{i}"
                # stable pseudo-count from the term hash
                h = int(hashlib.md5(term.encode()).hexdigest()[:6], 16)
                vocab[term] = ([st], [3 + h % 17])
    return vocab


def build_gold_labels():
    """Gold surface->type evaluation table — the engine analog of the
    reference's labeled benchmark extracts (ner_labeling/BC5CDR_chemical.txt
    et al., consumed by the external ner_test loop, README.md:19,64): each
    vocab surface labeled with its DOMINANT subtype (highest count; first
    listed wins ties — deterministic).  Returns a pandas DataFrame
    (surface_norm, gold_type) sorted by surface_norm; unique by
    construction, so joining mentions against it never fans out."""
    import pandas as pd

    vocab = build_vocab()
    rows = []
    for term, (subtypes, counts) in vocab.items():
        best = max(range(len(subtypes)), key=lambda i: (counts[i], -i))
        rows.append((term, subtypes[best]))
    return (
        pd.DataFrame(rows, columns=["surface_norm", "gold_type"])
        .sort_values("surface_norm")
        .reset_index(drop=True)
    )


def vocab_types_by_subtype(vocab: dict[str, tuple[list[str], list[int]]]) -> dict[str, list[str]]:
    """subtype -> ordered list of vocab terms carrying that subtype."""
    by_st: dict[str, list[str]] = {}
    for term in vocab:  # dict order is deterministic (insertion order)
        for st in vocab[term][0]:
            by_st.setdefault(st, []).append(term)
    return by_st
