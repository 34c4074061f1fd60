"""Search-query generation (reference N9, queries.py:9-106).

Exact reference semantics with an explicit seeded RNG (the reference uses
the global ``random`` module; determinism here is a constructor argument):

* ``combined_word_queries``       — random k-word samples (queries.py:9-19);
  word_count==1 -> type 'single', else 'combined'.
* ``phrase_queries``              — random consecutive windows
  (queries.py:22-30).
* ``common_uncommon_combinations``— split at freq > 10, half common / half
  uncommon (queries.py:33-48).
* ``order_and_remove_duplicates`` — sorted-tuple key, LAST type wins
  (queries.py:51-55 dict-comprehension semantics).
* ``exclude_english_lexicon``     — delete english_ref keys in place
  (queries.py:57-70).
* ``generate_all``                — 4 generators x query_count, dedup
  (queries.py:73-106); insert-if-new is the caller's seen-set.
"""

from __future__ import annotations

import random


def combined_word_queries(word_dict: dict, rng: random.Random, word_count: int = 2, query_count: int = 10) -> list[dict]:
    words = list(word_dict.keys())
    out = []
    for _ in range(query_count):
        query = " ".join(rng.sample(words, word_count))
        out.append(
            {"query": query, "type": "single" if word_count == 1 else "combined"}
        )
    return out


def phrase_queries(word_dict: dict, rng: random.Random, phrase_length: int = 2, query_count: int = 10) -> list[dict]:
    words = list(word_dict.keys())
    out = []
    for _ in range(query_count):
        start = rng.randint(0, len(words) - phrase_length)
        out.append(
            {"query": " ".join(words[start : start + phrase_length]), "type": "phrase"}
        )
    return out


def common_uncommon_combinations(word_dict: dict, rng: random.Random, word_count: int = 2, query_count: int = 10) -> list[dict]:
    common = [w for w, f in word_dict.items() if f > 10]
    uncommon = [w for w, f in word_dict.items() if f <= 10]
    out = []
    for _ in range(query_count):
        sel_c = rng.sample(common, word_count // 2)
        sel_u = rng.sample(uncommon, word_count - (word_count // 2))
        out.append({"query": " ".join(sel_c + sel_u), "type": "common_uncommon"})
    return out


def order_and_remove_duplicates(queries: list[dict]) -> list[dict]:
    sorted_queries = {
        tuple(sorted(item["query"].split())): item["type"] for item in queries
    }
    return [
        {"query": " ".join(key), "type": typ} for key, typ in sorted_queries.items()
    ]


def exclude_english_lexicon(lrl_word_dict: dict, english_word_dict: dict) -> None:
    for en_word in english_word_dict.keys():
        if en_word in lrl_word_dict:
            del lrl_word_dict[en_word]


def generate_all(
    word_dict: dict,
    seed: int = 42,
    english_word_dict: dict | None = None,
    word_count: int = 3,
    query_count: int = 10,
) -> list[dict]:
    rng = random.Random(seed)
    word_dict = dict(word_dict)
    if english_word_dict is not None:
        exclude_english_lexicon(word_dict, english_word_dict)
    queries: list[dict] = []
    queries.extend(combined_word_queries(word_dict, rng, 1, query_count))
    queries.extend(combined_word_queries(word_dict, rng, word_count, query_count))
    queries.extend(phrase_queries(word_dict, rng, word_count, query_count))
    queries.extend(common_uncommon_combinations(word_dict, rng, word_count, query_count))
    return order_and_remove_duplicates(queries)
