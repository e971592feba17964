"""Hashed-feature Naive Bayes classifier (operators/curation): semantic
classification on separable vocabularies, unseen-vocabulary fallback,
persisted-model parity, edge cases, and plan pins. The bit-exact DuckDB
differential lives in the `nbcls` gate part (test_suite_oracle).

Reference scope note: no classifier stage exists in the reference
engine — this extends the training-data curation tier.
"""

import pytest
from pyspark.sql import Row, functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.curation import nb_classify, train_nb_classifier
from mallarddv_spark.plans.audit import plan_report


@pytest.fixture(scope="module")
def model_and_test(spark):
    train = spark.createDataFrame(
        [Row(doc_id=i, label="sci",
             text="quantum flux lattice boson entropy " * 4)
         for i in range(10)]
        + [Row(doc_id=100 + i, label="pets",
               text="cat dog fish bird hamster " * 4)
           for i in range(10)]
    )
    nb = train_nb_classifier(train, "label", "text", buckets=1024)
    test = spark.createDataFrame(
        [Row(doc_id=1000, text="quantum boson entropy flux"),
         Row(doc_id=1001, text="dog cat hamster bird"),
         Row(doc_id=1002, text="entirely novel words here"),
         Row(doc_id=1003, text="")]
    )
    return nb, test


def test_classifies_separable_vocabularies(spark, model_and_test):
    nb, test = model_and_test
    out = {r.doc_id: r for r in nb_classify(test, "doc_id", "text", nb).collect()}
    assert out[1000].predicted == "sci"
    assert out[1001].predicted == "pets"
    # all 4 unigrams are in-vocab (bigrams depend on word order and may
    # not be): 4 tokens + 3 bigrams = 7 grams, at least 4 seen
    assert out[1000].n_grams == 7 and out[1000].n_seen >= 4


def test_unseen_vocabulary_falls_back_to_prior(spark, model_and_test):
    nb, test = model_and_test
    out = {r.doc_id: r for r in nb_classify(test, "doc_id", "text", nb).collect()}
    novel = out[1002]
    assert novel.n_seen == 0 and novel.n_grams > 0
    # equal priors + all-default likelihoods: tie resolves to the
    # lexicographically greatest label — pinned, not accidental
    assert novel.predicted == "sci"
    # empty doc: no features, no row
    assert 1003 not in out


def test_persisted_model_parity(spark, model_and_test, tmp_path):
    from mallarddv_spark.operators.curation import (
        load_nb_classifier,
        save_nb_classifier,
    )

    nb, test = model_and_test
    p = str(tmp_path / "nb")
    save_nb_classifier(nb, p)
    stored = load_nb_classifier(spark, p)
    assert (stored["buckets"], stored["n_max"], stored["hash_mode"],
            stored["lowercase"]) == (nb["buckets"], nb["n_max"],
                                     nb["hash_mode"], nb["lowercase"])
    a = sorted(map(tuple, nb_classify(test, "doc_id", "text", nb).collect()))
    b = sorted(map(tuple, nb_classify(test, "doc_id", "text", stored).collect()))
    assert a == b


def test_null_labels_ignored(spark):
    train = spark.createDataFrame(
        [Row(doc_id=1, label="a", text="x y z"),
         Row(doc_id=2, label=None, text="p q r"),
         Row(doc_id=3, label="b", text="m n o")]
    )
    nb = train_nb_classifier(train, "label", "text", buckets=64)
    labels = {r.label for r in nb["priors"].collect()}
    assert labels == {"a", "b"}


def test_guards(spark):
    df = spark.createDataFrame([Row(doc_id=1, label="a", text="x")])
    with pytest.raises(DVConfigurationError, match="buckets"):
        train_nb_classifier(df, "label", "text", buckets=0)
    with pytest.raises(DVConfigurationError, match="smoothing"):
        train_nb_classifier(df, "label", "text", smoothing=0)


def test_plan_shapes(spark, model_and_test):
    """Model grid and priors ride broadcasts; the corpus side never
    shuffles on anything but doc-keyed aggregations; no Python stages."""
    nb, test = model_and_test
    out = nb_classify(test, "doc_id", "text", nb)
    rep = plan_report(out)
    assert rep["python_stages"] == 0
    assert rep["broadcast_hash_joins"] >= 2
