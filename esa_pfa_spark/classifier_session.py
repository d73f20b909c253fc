"""Resumable classifier training session — the CBIR active-learning
state artifact.

Reference parity: ClassifierModel.java:123-150 (toXML / fromXML /
fromFile / toFile — the classifier's whole state serialized so a
labeling session survives process death) driving the
Classifier.startTraining / trainAndClassify loop (Classifier.java:41-43)
with uncertainty sampling (ActiveLearning.java:483-493).  The reference
persists the SVM model reference, iteration counter, and the labeled
patch lists as XStream XML; this engine persists the logreg
coefficients (scoring.logreg_fit), labeled ids, RNG seed, and round
counter as CANONICAL JSON — sorted keys, sorted labeled-id pairs,
Python ``repr`` floats — written atomically (tmp + rename, the
manifest.py checkpoint discipline) so a killed writer can never leave
a torn artifact and a byte-diff of two artifacts IS a state diff.

Session loop (one round)::

    picks = sess.propose(emb, k=8)        # most-ambiguous unlabeled
    sess.record_labels({id: 0/1, ...})    # the human (or rule) answers
    sess.refit(emb)                       # distributed GD re-train
    sess.save(path)                       # atomic checkpoint

Determinism contract: given (seed, data, label answers), the artifact
bytes after round r are identical whether the process ran straight
through or was killed and resumed from the round r-1 artifact —
regression-pinned by tests/test_classifier_session.py.

Scale shape: ``propose`` is a TakeOrderedAndProject over the scored
corpus minus a broadcast anti-join of labeled ids (the labeled set is
human-sized — hundreds, never millions); ``refit`` joins the broadcast
labeled ids to the corpus then runs logreg_fit's one-aggregation-per-
round GD.  The artifact itself is O(labeled + dims) bytes — driver
state only, like the reference's XML.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esa_pfa_spark.operators.scoring import logreg_fit
from esa_pfa_spark.plans.query import most_ambiguous

_FORMAT = "esa-pfa-spark/classifier-session@1"


@dataclass
class ClassifierSession:
    """Driver-side session state (ClassifierModel analog).

    ``labeled`` maps id -> label (0/1); ``rounds`` counts completed
    refits (numIterations, ClassifierModel.java:101-107); ``weights`` /
    ``bias`` are the logreg_fit coefficients (SvmModelReference
    analog); ``seed`` is recorded so any seeded sampling a caller
    layers on (deterministic_sample) resumes identically.
    """

    name: str
    dims: int = 4
    lr: float = 0.5
    iters: int = 6
    seed: int = 0
    rounds: int = 0
    labeled: dict[int, int] = field(default_factory=dict)
    weights: list[float] = field(default_factory=list)
    bias: float = 0.0
    n_rows: int = 0

    def __post_init__(self) -> None:
        if not self.weights:
            self.weights = [0.0] * self.dims

    # ------------------------------------------------------------ state io
    def to_json(self) -> str:
        """Canonical bytes: sorted keys, labeled pairs sorted by id.
        json.dumps floats use repr (shortest round-trip) — stable across
        processes, so equal state <=> equal bytes."""
        doc = {
            "format": _FORMAT,
            "name": self.name,
            "dims": self.dims,
            "lr": self.lr,
            "iters": self.iters,
            "seed": self.seed,
            "rounds": self.rounds,
            "labeled": sorted([int(k), int(v)] for k, v in self.labeled.items()),
            "weights": self.weights,
            "bias": self.bias,
            "n_rows": self.n_rows,
        }
        return json.dumps(doc, sort_keys=True, separators=(",", ":")) + "\n"

    def save(self, path: str | Path) -> None:
        """Atomic write (tmp + rename) — toFile, ClassifierModel.java:144,
        hardened: the reference's FileWriter can tear on kill; rename
        within a directory is atomic on POSIX, so readers see either the
        old round's artifact or the new one, never a prefix."""
        path = Path(path)
        tmp = path.with_suffix(path.suffix + ".tmp")
        tmp.write_text(self.to_json())
        os.replace(tmp, path)

    @classmethod
    def loads(cls, text: str) -> "ClassifierSession":
        doc = json.loads(text)
        if doc.get("format") != _FORMAT:
            raise ValueError(f"not a classifier-session artifact: {doc.get('format')!r}")
        return cls(
            name=doc["name"], dims=doc["dims"], lr=doc["lr"], iters=doc["iters"],
            seed=doc["seed"], rounds=doc["rounds"],
            labeled={int(k): int(v) for k, v in doc["labeled"]},
            weights=[float(w) for w in doc["weights"]],
            bias=float(doc["bias"]), n_rows=int(doc["n_rows"]),
        )

    @classmethod
    def load(cls, path: str | Path) -> "ClassifierSession":
        """fromFile (ClassifierModel.java:137-143)."""
        return cls.loads(Path(path).read_text())

    # ------------------------------------------------------- session loop
    def _decision(self):
        """Linear decision value w.x + b (pre-sigmoid margin — the SVM
        decision-value analog the uncertainty sampler ranks on)."""
        z = F.lit(self.bias)
        for j, w in enumerate(self.weights):
            z = z + F.lit(w) * F.col("embedding").getItem(j).cast("double")
        return z

    def _labeled_df(self, spark: SparkSession) -> DataFrame:
        rows = sorted((int(k), int(v)) for k, v in self.labeled.items())
        return spark.createDataFrame(rows or [(-1, -1)], "vec_id long, label int").filter(
            F.col("vec_id") >= 0
        )

    def propose(self, emb: DataFrame, k: int) -> DataFrame:
        """The k most ambiguous UNLABELED vectors under the current model
        (startTraining / getMostAmbiguous).  Round 0 (zero weights) makes
        every margin 0.0, so the pick degenerates to the lowest-id k — the
        deterministic seed query.  Returns (vec_id, decision)."""
        spark = emb.sparkSession
        pool = emb.join(
            F.broadcast(self._labeled_df(spark).select("vec_id")), "vec_id", "left_anti"
        )
        scored = pool.select("vec_id", self._decision().alias("decision"))
        return most_ambiguous(scored, "decision", k, tiebreak="vec_id")

    def record_labels(self, answers: dict[int, int]) -> None:
        """trainAndClassify's labeledPatches input: merge the round's
        human labels (later answers overwrite — relabeling is allowed,
        as in the reference UI)."""
        for i, y in answers.items():
            self.labeled[int(i)] = int(y)

    def refit(self, emb: DataFrame) -> None:
        """Re-train on the full labeled set (trainAndClassify): broadcast
        the labeled ids onto the corpus, run logreg_fit's distributed GD,
        bump the round counter."""
        spark = emb.sparkSession
        data = emb.join(F.broadcast(self._labeled_df(spark)), "vec_id")
        self.weights, self.bias, self.n_rows = logreg_fit(
            data, vec_col="embedding", label_col="label", positive=1,
            dims=self.dims, lr=self.lr, iters=self.iters,
        )
        self.rounds += 1

    def classify(self, emb: DataFrame, threshold: float = 0.0) -> DataFrame:
        """Score the corpus with the current model: (vec_id, decision,
        label) where label applies the Patch RELEVANT/IRRELEVANT enum
        via scoring.classify_threshold."""
        from esa_pfa_spark.operators.scoring import classify_threshold

        return classify_threshold(
            emb.select("vec_id", self._decision().alias("decision")),
            decision_col="decision", threshold=threshold,
        )
