"""BoW / VLAD aggregation kernels incl. the soft-assign over-count quirk."""

import numpy as np

from multimedia_indexing_ray.functions.bow import assign_topk, bow_histogram, vlad_aggregate

CENTROIDS = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])


def test_assign_topk():
    d = np.array([[1.0, 0.0], [9.0, 1.0]])
    np.testing.assert_array_equal(assign_topk(d, CENTROIDS, 1)[:, 0], [0, 1])
    top2 = assign_topk(d, CENTROIDS, 2)
    np.testing.assert_array_equal(top2[0], [0, 1])  # ordered by distance


def test_bow_hard():
    d = np.array([[1.0, 0.0], [9.0, 1.0], [0.2, 0.1]])
    np.testing.assert_array_equal(bow_histogram(d, CENTROIDS, k=1), [2, 1, 0])


def test_bow_soft_overcount_quirk():
    d = np.array([[1.0, 0.0]])
    # textbook: top-2 -> one count each in bins 0 and 1
    clean = bow_histogram(d, CENTROIDS, k=2, reference_quirk=False)
    np.testing.assert_array_equal(clean, [1, 1, 0])
    # reference quirk: incremented descriptorLength (=2) times per bin
    quirk = bow_histogram(d, CENTROIDS, k=2, reference_quirk=True)
    np.testing.assert_array_equal(quirk, [2, 2, 0])


def test_bow_empty_is_zero():
    np.testing.assert_array_equal(bow_histogram(np.empty((0, 2)), CENTROIDS), [0, 0, 0])


def test_vlad():
    d = np.array([[1.0, 0.5], [9.0, 1.0]])
    v = vlad_aggregate(d, CENTROIDS)
    np.testing.assert_allclose(v, [1.0, 0.5, -1.0, 1.0, 0.0, 0.0])
    # empty set -> zero vector (VladAggregator.java:37-39)
    np.testing.assert_array_equal(vlad_aggregate(np.empty((0, 2)), CENTROIDS), np.zeros(6))
