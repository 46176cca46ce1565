"""PRF expansion-term mining: integer-exact selection rule."""

import pandas as pd
import pyarrow as pa

import ray.data
from mini_ivf_ray.pipelines.prf import expansion_terms


def _docs():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                "apple banana banana cherry",
                "banana cherry cherry dates",
                "apple apple eggs",
                "zebra zebra zebra",  # not a feedback doc
            ],
        }
    )


def test_expansion_rule():
    results = pd.DataFrame(
        {"query_id": [0, 0, 0], "doc_id": [1, 2, 3]}
    )
    df_lookup = {"apple": 2, "banana": 9, "cherry": 2, "dates": 1, "eggs": 1}
    exp = expansion_terms(
        ray.data.from_arrow(_docs()),
        results,
        {0: "apple pie"},
        df_lookup,
        n_expand=2,
    )
    # apple excluded (query term); sums: banana 3, cherry 3, dates 1,
    # eggs 1 -> tie banana/cherry broken by df asc (cherry 2 < banana 9)
    assert exp[0] == ["cherry", "banana"]

    # stopword exclusion + blocking independence
    exp2 = expansion_terms(
        ray.data.from_arrow(_docs()).repartition(4),
        results,
        {0: "apple pie"},
        df_lookup,
        n_expand=2,
        stopwords=frozenset(["cherry"]),
    )
    assert exp2[0] == ["banana", "dates"]
