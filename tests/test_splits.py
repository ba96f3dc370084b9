import numpy as np

from oaprogressionmmf_tpu.utils.splits import StratifiedGroupKFold


def _make_data(seed=0, n=300, n_groups=80):
    rng = np.random.RandomState(seed)
    groups = rng.randint(0, n_groups, size=n)
    y = (rng.rand(n) < 0.3).astype(int)
    X = np.zeros((n, 2))
    return X, y, groups


def test_groups_never_split_across_folds():
    X, y, groups = _make_data()
    cv = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=0)
    for tr, te in cv.split(X, y, groups):
        assert set(groups[tr]).isdisjoint(set(groups[te]))


def test_folds_partition_all_samples():
    X, y, groups = _make_data()
    cv = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=0)
    all_test = np.concatenate([te for _, te in cv.split(X, y, groups)])
    assert sorted(all_test.tolist()) == list(range(len(y)))


def test_stratification_quality():
    X, y, groups = _make_data(n=1000, n_groups=400)
    cv = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=0)
    overall = y.mean()
    for _, te in cv.split(X, y, groups):
        assert abs(y[te].mean() - overall) < 0.08


def test_deterministic_given_seed():
    X, y, groups = _make_data()
    cv1 = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=7)
    cv2 = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=7)
    for (tr1, te1), (tr2, te2) in zip(cv1.split(X, y, groups),
                                      cv2.split(X, y, groups)):
        np.testing.assert_array_equal(te1, te2)


def test_matches_reference_docstring_example():
    # Exact example from the reference's docstring
    # (koafusion/various/_stratified_group_kfold.py:44-66)
    X = np.ones((17, 2))
    y = np.array([0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    groups = np.array([1, 1, 2, 2, 3, 3, 3, 4, 5, 5, 5, 5, 6, 6, 7, 8, 8])
    cv = StratifiedGroupKFold(n_splits=3)
    expected_test_groups = [[1, 1, 3, 3, 3, 8, 8], [2, 2, 6, 6, 7],
                            [4, 5, 5, 5, 5]]
    for (tr, te), exp in zip(cv.split(X, y, groups), expected_test_groups):
        assert groups[te].tolist() == exp


def test_fold_sizes_balanced():
    X, y, groups = _make_data(seed=3, n=1000, n_groups=400)
    cv = StratifiedGroupKFold(n_splits=4, shuffle=False)
    sizes = [len(te) for _, te in cv.split(X, y, groups)]
    assert max(sizes) - min(sizes) < 0.2 * (len(y) / 4)
