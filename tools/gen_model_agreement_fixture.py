#!/usr/bin/env python3
"""Generate fixtures/model4k_agreement.csv: the reference's TRAINED sklearn
forest replayed over this engine's feature matrix, so MatchModelSpec can pin
cross-runtime prediction agreement (VERDICT r10 #1 / r9 #3).

The reference ships its trained model as a joblib pickle
(/root/reference/TRAINED_MODELS/model_(4k).pkl, produced by
MODEL_TRAINING/train_model.py). sklearn/joblib are not installable here
(zero egress), so this script re-reads the PUBLIC on-disk formats directly:

 * joblib's numpy_pickle layout — a plain pickle stream where each ndarray
   is a NumpyArrayWrapper marker object followed in-stream by the raw
   buffer (alignment-padded; object-dtype arrays are a nested pickle).
   A dispatch-table override on pickle._Unpickler resurrects the arrays
   exactly as joblib.numpy_pickle.NumpyUnpickler does.
 * sklearn 1.7 RandomForestClassifier internals — per-tree `nodes`
   structured arrays (left_child/right_child/feature/threshold) and
   `values` (n_nodes, 1, n_classes); predict_proba is the row-normalized
   leaf value averaged across trees, predict is classes_[argmax] — the
   published estimator contract, re-implemented on the extracted arrays.
 * train_test_split(test_size=0.3, random_state=32) — sklearn's
   ShuffleSplit draws `RandomState(32).permutation(n)`, test = first
   ceil(0.3 n) positions (train_model.py:36); replayed with numpy alone.

Feature values come from graft's kernel re-derivations via
  sbt "runMain graft.app.FeatureDump /root/reference/TRAINING_DATA/training_data_(4k).csv /tmp/feats4k"
(bit-parity with thefuzz/jellyfish pinned separately by the 16,940-vector
fuzz_golden fixture), so the fixture's ref_pred column is exactly what the
reference model answers on the features the Spark pipeline feeds its own
forest — the apples-to-apples agreement target.

Usage:
  python3 tools/gen_model_agreement_fixture.py /tmp/feats4k
"""
import csv
import glob
import pickle
import sys

import numpy as np

PKL = "/root/reference/TRAINED_MODELS/model_(4k).pkl"
TRAIN_CSV = "/root/reference/TRAINING_DATA/training_data_(4k).csv"
OUT = "fixtures/model4k_agreement.csv"
FEATURES = ["levenshtein", "partial_ratio", "token_set_ratio",
            "soundex_match", "metaphone_match"]


class StubBase:
    """Placeholder for sklearn classes: capture ctor args + setstate dict."""

    def __init__(self, *a, **k):
        self._args = a

    def __setstate__(self, state):
        self._state = state


class NumpyArrayWrapper(StubBase):
    """joblib.numpy_pickle.NumpyArrayWrapper's read side, verbatim."""

    def read(self, fh):
        count = 1 if len(self.shape) == 0 else int(np.multiply.reduce(self.shape))
        if self.dtype.hasobject:
            return pickle.load(fh)  # nested pickle for object arrays
        if getattr(self, "numpy_array_alignment_bytes", None) is not None:
            padding_length = int.from_bytes(fh.read(1), "little")
            if padding_length:
                fh.read(padding_length)
        data = fh.read(count * self.dtype.itemsize)
        array = np.frombuffer(data, dtype=self.dtype, count=count).copy()
        if self.order == "F":
            array.shape = self.shape[::-1]
            return array.transpose()
        array.shape = self.shape
        return array

    def __setstate__(self, state):
        self.__dict__.update(state)


_stubs = {}


def _stub_for(module, name):
    key = f"{module}.{name}"
    if key not in _stubs:
        _stubs[key] = type(name, (StubBase,), {"_cls": key})
    return _stubs[key]


# The ONLY non-sklearn/joblib globals the unpickler will resolve. The
# pickle is UNTRUSTED reference content: a REDUCE opcode can call any
# resolvable global, so everything outside this list (os.system,
# subprocess, builtins.eval, ...) must raise instead of falling through to
# the default resolver. The sklearn 1.7 + joblib numpy_pickle layout only
# needs numpy's array/dtype reconstruction and passive containers.
_ALLOWED_GLOBALS = {
    ("numpy", "dtype"),
    ("numpy", "ndarray"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("builtins", "bytearray"),
    ("builtins", "complex"),
    ("builtins", "dict"),
    ("builtins", "frozenset"),
    ("builtins", "list"),
    ("builtins", "range"),
    ("builtins", "set"),
    ("builtins", "slice"),
    ("builtins", "tuple"),
    ("collections", "OrderedDict"),
}


class ModelUnpickler(pickle._Unpickler):
    # pickle._Unpickler dispatches opcodes through a class-level table, so
    # the BUILD hook must be rebound there (joblib does the same).
    dispatch = pickle._Unpickler.dispatch.copy()

    def find_class(self, module, name):
        if module == "joblib.numpy_pickle" and name.endswith("ArrayWrapper"):
            return NumpyArrayWrapper
        if module.startswith(("sklearn", "joblib")):
            return _stub_for(module, name)
        if (module, name) in _ALLOWED_GLOBALS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to resolve {module}.{name} from the untrusted model pickle")

    def load_build(self):
        pickle._Unpickler.load_build(self)
        if isinstance(self.stack[-1], NumpyArrayWrapper):
            self.stack[-1] = self.stack[-1].read(self._fh)

    dispatch[pickle.BUILD[0]] = load_build


def load_forest(path):
    with open(path, "rb") as f:
        u = ModelUnpickler(f)
        u._fh = f
        rf = u.load()
    st = rf._state
    assert list(st["feature_names_in_"]) == FEATURES, st["feature_names_in_"]
    trees = [(e._state["tree_"]._state["nodes"], e._state["tree_"]._state["values"])
             for e in st["estimators_"]]
    return np.asarray(st["classes_"]), trees


def tree_leaf_values(nodes, values, X):
    """values[leaf] for each row of X — the decision-path walk."""
    out = np.empty((X.shape[0], values.shape[2]))
    for i, x in enumerate(X):
        n = 0
        while nodes["left_child"][n] != -1:
            if x[nodes["feature"][n]] <= nodes["threshold"][n]:
                n = nodes["left_child"][n]
            else:
                n = nodes["right_child"][n]
        out[i] = values[n, 0, :]
    return out


def forest_predict(classes, trees, X):
    proba = np.zeros((X.shape[0], len(classes)))
    for nodes, values in trees:
        v = tree_leaf_values(nodes, values, X)
        proba += v / v.sum(axis=1, keepdims=True)
    return classes[np.argmax(proba, axis=1)]


def main():
    feats_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/feats4k"
    (part,) = glob.glob(f"{feats_dir}/part-*.csv")
    feats = {r["id"]: r for r in csv.DictReader(open(part))}
    rows = list(csv.DictReader(open(TRAIN_CSV)))  # file order == df index
    assert len(rows) == len(feats)

    X = np.array([[float(feats[r["id"]][c]) for c in FEATURES] for r in rows])
    classes, trees = load_forest(PKL)
    pred = forest_predict(classes, trees, X)

    # sklearn train_test_split(test_size=0.3, random_state=32), by position
    n = len(rows)
    n_test = int(np.ceil(n * 0.3))
    perm = np.random.RandomState(32).permutation(n)
    split = np.full(n, "train", dtype=object)
    split[perm[:n_test]] = "test"

    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "username", "employee_name", "label", "split", "ref_pred"])
        for i, r in enumerate(rows):
            w.writerow([r["id"], r["username"], r["employee_name"],
                        r["label"], split[i], int(pred[i])])

    y = np.array([int(r["label"]) for r in rows])
    test = split == "test"
    print(f"wrote {OUT}: {n} rows, {test.sum()} test")
    print(f"ref model accuracy on its own test split: {(pred[test] == y[test]).mean():.4f}")
    print(f"ref model accuracy overall:               {(pred == y).mean():.4f}")


if __name__ == "__main__":
    main()
