"""The batched numpy Levenshtein must equal Spark's JVM builtin exactly —
it replaces the builtin inside the pair scorer, and every score value
derives from its distances."""

import random

from pyspark.sql import functions as F

from gpu_entity_resolver_spark.functions.simfns import levenshtein_batch


def _pairs():
    rng = random.Random(13)
    alphabet = "abcdef gh"
    pairs = [
        ("", ""),
        ("", "abc"),
        ("abc", ""),
        ("abc", "abc"),
        ("kitten", "sitting"),
        ("héllo wörld", "hello world"),
        ("日本語テキスト", "日本語のテキスト"),
        ("a" * 144, "a" * 143 + "b"),
        ("x" * 144, "y" * 144),
    ]
    for _ in range(300):
        la = rng.randint(0, 144)
        lb = rng.randint(0, 144)
        base = "".join(rng.choice(alphabet) for _ in range(max(la, lb)))
        x = base[:la]
        # half the pairs are perturbed copies (the scorer's real workload),
        # half unrelated
        if rng.random() < 0.5:
            y = list(base[:lb])
            for _ in range(rng.randint(0, 6)):
                if y:
                    y[rng.randrange(len(y))] = rng.choice(alphabet)
            y = "".join(y)
        else:
            y = "".join(rng.choice(alphabet) for _ in range(lb))
        pairs.append((x, y))
    return pairs


def test_levenshtein_batch_matches_spark(spark):
    import pandas as pd

    pairs = _pairs()
    df = spark.createDataFrame(pairs, "a string, b string")
    want = [r.d for r in df.select(F.levenshtein("a", "b").alias("d")).collect()]
    got = levenshtein_batch(
        pd.Series([p[0] for p in pairs]), pd.Series([p[1] for p in pairs]),
        max_chars=144,
    )
    assert got.tolist() == want


def test_levenshtein_batch_small_chunks(spark):
    """Chunk boundaries must not affect values."""
    import pandas as pd

    pairs = _pairs()
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    full = levenshtein_batch(a, b, max_chars=144)
    small = levenshtein_batch(a, b, max_chars=144, chunk_rows=7)
    assert full.tolist() == small.tolist()
