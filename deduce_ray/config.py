"""Default pipeline configuration.

Mirrors the reference's base configuration
(/root/reference/deduce/base_config.json) — the regexps, token patterns and
context patterns are the *behavioral contract* this engine must reproduce
(P/R >= 0.95 against the reference's golden corpus), so they are kept
verbatim as data.  Structure: an ordered list of annotator specs plus global
post-processing settings; users may override via a nested-dict deep merge,
like the reference (deduce.py:96-123).
"""

from __future__ import annotations

import copy

_MONTHS = [
    "januari", "jan", "februari", "feb", "maart", "mrt", "april", "apr",
    "mei", "juni", "jun", "juli", "jul", "augustus", "aug", "september",
    "sep", "sept", "oktober", "okt", "november", "nov", "december", "dec",
]

_TLDS = ["com", "net", "org", "co", "us", "uk", "nl", "be", "fr", "sp", "gov", "nu"]

_NAME_CONTEXT_PATTERNS = [
    {
        "name": "interfix_right",
        "direction": "right",
        "pre_tag": ["initiaal", "naam", "voornaam", "achternaam",
                    "voornaam_patient", "achternaam_patient"],
        "tag": "{tag}+interfix+achternaam",
        "skip": [".", "-"],
        "pattern": [{"lookup": "interfix"}, {"like_name": True}],
    },
    {
        "name": "initial_left",
        "direction": "left",
        "pre_tag": ["initiaal", "naam", "voornaam", "achternaam",
                    "voornaam_patient", "achternaam_patient", "interfix"],
        "tag": "initiaal+{tag}",
        "skip": ["."],
        "pattern": [{"lookup": "initial"}],
    },
    {
        "name": "naam_left",
        "direction": "left",
        "pre_tag": ["naam", "voornaam", "achternaam",
                    "voornaam_patient", "achternaam_patient"],
        "tag": "naam+{tag}",
        "skip": ["-"],
        "pattern": [
            {"and": [{"like_name": True}, {"neg_lookup": "whitelist"},
                     {"neg_lookup": "prefix"}]}
        ],
    },
    {
        "name": "naam_right",
        "direction": "right",
        "pre_tag": ["prefix", "initiaal", "naam", "voornaam", "achternaam",
                    "voornaam_patient", "achternaam_patient", "interfix"],
        "tag": "{tag}+naam",
        "skip": ["-"],
        "pattern": [
            {"and": [{"like_name": True}, {"neg_lookup": "whitelist"},
                     {"neg_lookup": "prefix"}]}
        ],
    },
    {
        "name": "prefix_left",
        "direction": "left",
        "pre_tag": ["prefix", "initiaal", "naam", "voornaam", "achternaam",
                    "voornaam_patient", "achternaam_patient", "interfix"],
        "tag": "prefix+{tag}",
        "skip": ["."],
        "pattern": [{"and": [{"lookup": "prefix"}]}],
    },
]

_HOUSENUMBER_PATTERNS = [
    {
        "name": "housenumber_right",
        "direction": "right",
        "pre_tag": ["straat"],
        "tag": "{tag}+huisnummer",
        "skip": [],
        "pattern": [{"re_match": "\\d{1,4}$"}],
    },
    {
        "name": "housenumber_housenumberletter_right",
        "direction": "right",
        "pre_tag": ["straat"],
        "tag": "{tag}+huisnummer+huisnummerletter",
        "skip": [],
        "pattern": [{"re_match": "\\d{1,4}[a-zA-Z]$"}],
    },
    {
        "name": "housenumberletter_right",
        "direction": "right",
        "pre_tag": ["huisnummer"],
        "tag": "{tag}+huisnummerletter",
        "skip": [],
        "pattern": [{"re_match": "[a-zA-Z]$"}],
    },
]

_STREET_SUFFIX_RE = (
    "[A-Z][a-z]+(baan|bolwerk|dam|dijk|dreef|drf|dyk|gr|gracht|hf|hof|kade|"
    "laan|ln|markt|mrkt|pad|park|pd|plantsoen|plein|pln|plnts|prk|singel|"
    "sngl|st|steeg|stg|str|straat|weg|wg)$"
)

DEFAULT_CONFIG: dict = {
    "adjacent_annotations_slack": "[\\. \\-]?[\\. ]?",
    "resolve_overlap_strategy": {
        "attributes": ["priority", "length"],
        "ascending": [False, False],
    },
    "redactor_open_char": "[",
    "redactor_close_char": "]",
    "annotators": {
        "prefix_with_initial": {
            "type": "token_pattern", "group": "names",
            "args": {
                "tag": "prefix+initiaal", "skip": ["."],
                "pattern": [
                    {"lookup": "prefix"},
                    {"or": [{"lookup": "initial"}, {"is_initials": True}]},
                ],
            },
        },
        "prefix_with_interfix": {
            "type": "token_pattern", "group": "names",
            "args": {
                "tag": "prefix+interfix+naam", "skip": ["."],
                "pattern": [
                    {"lookup": "prefix"}, {"lookup": "interfix"},
                    {"like_name": True},
                ],
            },
        },
        "prefix_with_name": {
            "type": "token_pattern", "group": "names",
            "args": {
                "tag": "prefix+naam", "skip": ["."],
                "pattern": [
                    {"lookup": "prefix"},
                    {"and": [{"like_name": True}, {"neg_lookup": "whitelist"}]},
                ],
            },
        },
        "interfix_with_name": {
            "type": "token_pattern", "group": "names",
            "args": {
                "tag": "interfix+achternaam", "skip": [],
                "pattern": [
                    {"lookup": "interfix"},
                    {"and": [{"lookup": "interfix_surname"},
                             {"neg_lookup": "whitelist"}]},
                ],
            },
        },
        "initial_with_name": {
            "type": "token_pattern", "group": "names",
            "args": {
                "tag": "initiaal+naam", "skip": ["."],
                "pattern": [
                    {"lookup": "initial"},
                    {"and": [{"like_name": True}, {"neg_lookup": "whitelist"},
                             {"neg_lookup": "prefix"}]},
                ],
            },
        },
        "initial_interfix": {
            "type": "token_pattern", "group": "names",
            "args": {
                "tag": "initiaal+interfix+naam", "skip": ["."],
                "pattern": [
                    {"lookup": "initial"}, {"lookup": "interfix"},
                    {"like_name": True},
                ],
            },
        },
        "first_name_lookup": {
            "type": "multi_token_lookup", "group": "names",
            "args": {"tag": "voornaam", "overlapping": True,
                     "lookup_values": "first_name"},
        },
        "surname_lookup": {
            "type": "multi_token_lookup", "group": "names",
            "args": {"tag": "achternaam", "overlapping": True,
                     "lookup_values": "surname"},
        },
        "patient_name": {
            "type": "patient_name", "group": "names",
            "args": {"tag": "_"},
        },
        "name_context": {
            "type": "context", "group": "names",
            "args": {"iterative": True, "pattern": _NAME_CONTEXT_PATTERNS},
        },
        "eponymous_disease": {
            "type": "multi_token_lookup", "group": "names",
            "args": {"tag": "pseudo_name", "overlapping": True,
                     "lookup_values": "eponymous_disease"},
        },
        "placename": {
            "type": "multi_token_lookup", "group": "locations",
            "args": {"tag": "locatie", "overlapping": True,
                     "lookup_values": "placename"},
        },
        "street_pattern": {
            "type": "token_pattern", "group": "locations",
            "args": {"tag": "straat", "priority": 1,
                     "pattern": [{"re_match": _STREET_SUFFIX_RE}]},
        },
        "street_lookup": {
            "type": "multi_token_lookup", "group": "locations",
            "args": {"tag": "straat", "priority": 1, "overlapping": True,
                     "lookup_values": "street"},
        },
        "housenumber": {
            "type": "context", "group": "locations",
            "args": {"iterative": True, "pattern": _HOUSENUMBER_PATTERNS},
        },
        "postal_code": {
            "type": "regexp", "group": "locations",
            "args": {
                "regexp_pattern":
                    "(\\d{4}([A-Za-z]{2}| [A-Z]{2}))(?<!mg|MG|gr|ie)(\\W|$)",
                "capturing_group": 1, "tag": "locatie", "requires_digit": True,
            },
        },
        "postbus": {
            "type": "regexp", "group": "locations",
            "args": {
                "regexp_pattern": "([Pp]ostbus\\s\\d{1,5}(\\.\\d{2,4})?)",
                "tag": "locatie", "requires_digit": True,
                "pre_match_words": ["postbus"],
            },
        },
        "hospital": {
            "type": "multi_token_lookup", "group": "institutions",
            "args": {"tag": "ziekenhuis", "overlapping": True,
                     "lookup_values": "hospital"},
        },
        "institution": {
            "type": "multi_token_lookup", "group": "institutions",
            "args": {"tag": "zorginstelling", "overlapping": True,
                     "lookup_values": "healthcare_institution"},
        },
        "date_dmy_1": {
            "type": "regexp", "group": "dates",
            "args": {
                "regexp_pattern":
                    "(?<!\\d)(([1-9]|0[1-9]|[12][0-9]|3[01])(?P<sep>[-/\\. ])"
                    "([1-9]|0[1-9]|1[012])(?P=sep)((19|20|\\'|`)?\\d{2}))(?!\\d)",
                "tag": "datum", "capturing_group": 1, "requires_digit": True,
            },
        },
        "date_dmy_2": {
            "type": "regexp", "group": "dates",
            "args": {
                "regexp_pattern":
                    "(?i)(?<!\\d)(([1-9]|0[1-9]|[12][0-9]|3[01])[-/\\. ]{,2}"
                    "(januari|jan|februari|feb|maart|mrt|april|apr|mei|juni|"
                    "jun|juli|jul|augustus|aug|september|sep|sept|oktober|okt|"
                    "november|nov|december|dec)[-/\\. ]((19|20|\\'|`)?\\d{2}))"
                    "(?!\\d)",
                "tag": "datum", "capturing_group": 1, "requires_digit": True,
                "pre_match_words": _MONTHS,
            },
        },
        "date_ymd_1": {
            "type": "regexp", "group": "dates",
            "args": {
                "regexp_pattern":
                    "(?<!\\d)(((19|20|\\'|`)\\d{2})(?P<sep>[-/\\. ])"
                    "([1-9]|0[1-9]|1[012])(?P=sep)"
                    "([1-9]|0[1-9]|[12][0-9]|3[01]))(\\D|$)",
                "tag": "datum", "capturing_group": 1, "requires_digit": True,
            },
        },
        "date_ymd_2": {
            "type": "regexp", "group": "dates",
            "args": {
                "regexp_pattern":
                    "(?i)(?<!\\d)(((19|20|\\'|`)\\d{2})[-/\\. ]{,2}"
                    "(januari|jan|februari|feb|maart|mrt|april|apr|mei|juni|"
                    "jun|juli|jul|augustus|aug|september|sep|sept|oktober|okt|"
                    "november|nov|december|dec)[-/\\. ]"
                    "([1-9]|0[1-9]|[12][0-9]|3[01]))(?!\\d)",
                "tag": "datum", "capturing_group": 1, "requires_digit": True,
                "pre_match_words": _MONTHS,
            },
        },
        "age": {
            "type": "regexp_pseudo", "group": "ages",
            "args": {
                "regexp_pattern":
                    "(?i)(?<![\\d,\\.])((1?\\d?\\d)([\\.,]5)?(-(1?\\d?\\d)"
                    "([\\.,]5)?)?)([ -](jaar|jarig|jarige|jr))(?!\\w)",
                "pre_pseudo": ["<", "al", "co", "controle", "de", "elke",
                               "gedurende", "na", "nog", "ongeveer", "over",
                               "policontrole", "sinds", "up", "vanaf"],
                "post_pseudo": ["aanwezig", "gebruikt", "geleden", "gerookt",
                                "gestaakt", "gestopt", "getrouwd", "na",
                                "naar", "nadien"],
                "pre_match_words": ["jaar", "jarig", "jarige", "jr"],
                "tag": "leeftijd", "capturing_group": 1,
                "requires_digit": True,
            },
        },
        "bsn": {
            "type": "bsn", "group": "identifiers",
            "args": {
                "bsn_regexp": "(?<!\\d)(\\d{9})(?!\\d)",
                "capture_group": 1, "priority": 100, "tag": "bsn",
            },
        },
        "identifier": {
            "type": "regexp", "group": "identifiers",
            "args": {"regexp_pattern": "\\d{7,}", "tag": "id",
                     "requires_digit": True},
        },
        "phone": {
            "type": "phone", "group": "phone_numbers",
            "args": {
                "phone_regexp":
                    "(?<!\\d)(\\(?(0031|\\+31|0)(1[035]|2[0347]|3[03568]|"
                    "4[03456]|5[0358]|6|7|88|800|91|90[069]|[1-5]\\d{2})\\)?)"
                    " ?-? ?((\\d{2,4}[ -]?)+\\d{2,4})",
                "min_digits": 9, "max_digits": 11, "tag": "telefoonnummer",
            },
        },
        "email": {
            "type": "regexp", "group": "email_addresses",
            "args": {
                "regexp_pattern":
                    "(([-a-zA-Z0-9:%._\\+~#=]{1,256})@([-a-zA-Z0-9:%._\\+~#=]"
                    "{1,256})(\\.)(com|net|org|co|us|uk|nl|be|fr|sp|gov|nu))",
                "tag": "emailadres", "pre_match_words": _TLDS,
            },
        },
        "url": {
            "type": "regexp", "group": "urls",
            "args": {
                "regexp_pattern":
                    "((https?:\\/\\/(?:www\\.)?)?([-a-zA-Z0-9:%._\\+~#=]"
                    "{1,256})(\\.)(com|net|org|co|us|uk|nl|be|fr|sp|gov|nu)"
                    "(\\b)([():%_\\+.~,]*[-a-zA-Z-0-9#?&/=]+)*)",
                "tag": "url", "pre_match_words": _TLDS,
            },
        },
    },
}


def merge_config(base: dict, override: dict) -> dict:
    """Nested deep-merge (override wins), like the reference's
    utils.overwrite_dict (deduce/utils.py:75-88)."""
    for key, value in override.items():
        if isinstance(value, dict) and isinstance(base.get(key), dict):
            merge_config(base[key], value)
        else:
            base[key] = value
    return base


def default_config(user_config: dict | None = None) -> dict:
    config = copy.deepcopy(DEFAULT_CONFIG)
    if user_config:
        merge_config(config, user_config)
    return config
