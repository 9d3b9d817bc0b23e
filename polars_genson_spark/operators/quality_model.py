"""Learned quality filtering: the classic pretraining-data move (a
logistic-regression classifier over cheap text features, GPT-3/CCNet
style) split into its two scale-appropriate halves:

- TRAIN on a small labeled sample with MLlib (driver-coordinated,
  sample-sized — you never train on the full corpus);
- SCORE the full corpus with the trained weights as a pure codegen
  sigmoid expression (no model object, no Python, no MLlib at scoring
  time — the weights are just literals in the plan).

The weight vector is the hand-off: small enough to store in a manifest,
deterministic given the sample, and the scoring side is SQL-expressible
(which is how the driver query oracles it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> list[float]:
    """Fit logistic regression on the labeled sample; returns
    ``[intercept, w_1, ..., w_k]`` aligned with ``feature_cols``.

    MLlib's LBFGS is deterministic for a fixed input sample, so the
    returned weights are reproducible; persist them (e.g. in the run
    manifest) and score any number of corpora without retraining."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="_features"
    ).transform(df.select(label_col, *feature_cols).na.drop())
    model = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    ).fit(assembled)
    return [float(model.intercept)] + [float(w) for w in model.coefficients]


def score_quality(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    out_col: str = "quality_prob",
    round_dp: int = 6,
) -> DataFrame:
    """Sigmoid(w·x + b) as a single codegen expression — the weights are
    literals, so scoring is a narrow projection over one scan: no MLlib,
    no UDF, fully whole-stage-codegen'd, and SQL-mirrorable for oracles."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"{len(feature_cols)} features need {len(feature_cols) + 1} "
            f"weights (intercept first), got {len(weights)}"
        )
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, F.round(prob, round_dp))
