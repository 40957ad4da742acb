"""Data-cleaning rules as composable Column expressions (zero UDFs).

Re-expresses the reference's conformance rules (SURVEY.md §2.2 P6-P9;
``/root/reference/amsterdam_map_data_wrangling.py:85-146``) as pure
``pyspark.sql.functions`` expressions so they stay inside Catalyst /
WholeStageCodegen — on 100 TB these run vectorized JVM-side instead of
row-at-a-time Python.

Documented-intent semantics are the default; the reference's Python-2
quirks that we deliberately do *not* reproduce are noted per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Key-namespace pattern (reference ``:85``): lowercase/underscore key
#: segments on both sides of the first colon. Keys like ``naam:NL`` fail
#: the second group and stay un-split with type='regular' — reference
#: quirk (b) in SURVEY.md §2.2, preserved because it is observable in the
#: shipped ways_tags.csv output.
LOWER_COLON_PATTERN = r"^([a-z]|_)+:([a-z]|_)+"

#: Problematic-character pattern (reference ``:86``). Declared in the
#: reference but never enforced (quirk d); we enforce the documented
#: intent ("tags with problematic chars should be ignored") behind a flag.
PROBLEMCHARS_PATTERN = r"""[=\+/&<>;'"\?%#$@,\. \t\r\n]"""


def split_tag_key(k: Column) -> tuple[Column, Column]:
    """Split an EAV tag key at its first colon into (type, key).

    ``addr:postcode`` → (``addr``, ``postcode``); ``addr:street:name`` →
    (``addr``, ``street:name``) — extra colons stay in the key; non-matching
    keys → (``regular``, unchanged). Reference ``:117-126``.
    """
    matches = k.rlike(LOWER_COLON_PATTERN)
    tag_type = F.when(matches, F.substring_index(k, ":", 1)).otherwise(F.lit("regular"))
    tag_key = F.when(matches, F.substr(k, F.instr(k, ":") + F.lit(1))).otherwise(k)
    return tag_type, tag_key


def is_problematic_key(k: Column) -> Column:
    """True when the key contains a character the reference declares
    problematic (``:86``); used to drop such tags (documented intent P7)."""
    return k.rlike(PROBLEMCHARS_PATTERN)


def normalize_postcode(v: Column) -> Column:
    """Canonicalize a Dutch postcode to ``"NNNN AA"``.

    Reference ``:128-129``: ``v.lstrip()[0:4] + " " + v.rstrip()[-2:]``.
    ``"1016CJ"`` → ``"1016 CJ"``; ``" 1073BP "`` → ``"1073 BP"``.
    """
    return F.concat(
        F.substring(F.ltrim(v), 1, 4),
        F.lit(" "),
        F.substring(F.rtrim(v), -2, 2),
    )


def clean_tag_value(raw_key: Column, split_key: Column, v: Column) -> Column:
    """The reference's tag-value cleaning dispatch
    (``amsterdam_map_data_wrangling.py:128-146``): postcode normalization
    fires on the *post-split* key (so ``addr:postcode`` qualifies) and takes
    priority (``if``/``elif``); phone normalization fires on the *raw*
    pre-split key only (so ``contact:phone`` passes through unchanged).
    """
    return (
        F.when(split_key == "postcode", normalize_postcode(v))
        .when(raw_key == "phone", normalize_phone(v))
        .otherwise(v)
    )


def normalize_phone(v: Column) -> Column:
    """Canonicalize a phone number to E.164-ish ``+31...`` form.

    Reference ``:131-146``: strip to digits, then a length-based case
    analysis (examples/rationale at ``Readme.md:36-82``):

    ==========  =========================================  =================
    len(digits) rule                                        example
    ==========  =========================================  =================
    11 or 9     ``'+' + d``                                 31206255537 → +31206255537
    12          ``'+' + d[:2] + d[3:]`` (drop trunk 0)      310206255975 → +31206255975
    10 or 8     ``'+31' + d[1:]`` (drop leading 0)          0206255975 → +31206255975
    13          ``'+' + d[2:]`` (drop 00 prefix)            0031900802060 → +31900802060
    7           ``'+31' + d``                               9008020 → +319008020
    other       digits unchanged
    ==========  =========================================  =================
    """
    d = F.regexp_replace(v, "[^0-9]", "")
    n = F.length(d)
    return (
        F.when((n == 11) | (n == 9), F.concat(F.lit("+"), d))
        .when(n == 12, F.concat(F.lit("+"), F.substring(d, 1, 2), F.substr(d, F.lit(4))))
        .when((n == 10) | (n == 8), F.concat(F.lit("+31"), F.substr(d, F.lit(2))))
        .when(n == 13, F.concat(F.lit("+"), F.substr(d, F.lit(3))))
        .when(n == 7, F.concat(F.lit("+31"), d))
        .otherwise(d)
    )
