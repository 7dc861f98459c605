"""Consensus callers: Modal/Median tie-breaking, Bayesian model."""

import numpy as np
import pytest

from shasta_tpu.consensus.caller import (
    GAP,
    MedianConsensusCaller,
    ModalConsensusCaller,
    get_consensus_caller,
    most_frequent_base,
)
from shasta_tpu.consensus.bayesian import (
    BayesianConsensusCaller,
    load_model_csv,
    parametric_model,
)
from shasta_tpu.consensus import msa as MSA


def test_most_frequent_base_tie_break():
    # Tie between C(1) and T(3): smaller base value wins (reference
    # scans ascending with strictly-greater).
    assert most_frequent_base(np.array([1, 3, 3, 1])) == 1
    # Gap can win.
    assert most_frequent_base(np.array([4, 4, 0])) == GAP


def test_modal_caller():
    c = ModalConsensusCaller()
    b, r = c(np.array([0, 0, 1]), np.array([3, 3, 2]))
    assert (b, r) == (0, 3)
    # Repeat tie -> smaller count.
    b, r = c(np.array([0, 0]), np.array([2, 5]))
    assert (b, r) == (0, 2)


def test_median_caller():
    c = MedianConsensusCaller()
    b, r = c(np.array([0, 0, 0]), np.array([1, 2, 9]))
    assert (b, r) == (0, 2)


def test_bayesian_parametric():
    c = BayesianConsensusCaller("default")
    # Clean observations: prediction equals the observation.
    for true_len in (1, 3, 7, 12):
        bases = np.zeros(10, np.int64)
        reps = np.full(10, true_len)
        b, r = c(bases, reps)
        assert b == 0
        assert r == true_len, (true_len, r)
    # Noisy observations around 5 -> 5.
    bases = np.zeros(9, np.int64)
    reps = np.array([5, 5, 5, 4, 5, 6, 5, 4, 5])
    assert c(bases, reps)[1] == 5
    # Non-consensus-base repeats are ignored.
    bases = np.array([0, 0, 0, 2, 2])
    reps = np.array([4, 4, 4, 30, 30])
    assert c(bases, reps) == (0, 4)


def test_bayesian_csv_round_trip(tmp_path):
    m = parametric_model(max_len=10)
    p = tmp_path / "model.csv"
    with open(p, "w") as f:
        f.write(">Name\ntest-model\n\n")
        f.write(">AT prior\n" + ",".join(map(str, m.priors[0])) + "\n\n")
        f.write(">GC prior\n" + ",".join(map(str, m.priors[1])) + "\n\n")
        for i, b in enumerate("ACGT"):
            f.write(f">{b} likelihood\n")
            for row in m.likelihood[i]:
                f.write(",".join(map(str, row)) + "\n")
            f.write("\n")
    m2 = load_model_csv(str(p))
    assert m2.name == "test-model"
    np.testing.assert_allclose(m2.priors, m.priors)
    np.testing.assert_allclose(m2.likelihood, m.likelihood)


def test_get_consensus_caller_specs():
    import warnings as W

    assert get_consensus_caller("Modal").name == "Modal"
    assert get_consensus_caller("Median").name == "Median"
    # Trained built-in models resolve without a fallback warning.
    with W.catch_warnings():
        W.simplefilter("error")
        c = get_consensus_caller("Bayesian:guppy-5.0.7-b")
    assert c.name == "Bayesian"
    assert "guppy_5.0.7" in c.model.name or "guppy5.0.7" in c.model.name
    # Unknown model names still fall back with a warning.
    with pytest.warns(UserWarning):
        get_consensus_caller("Bayesian:not-a-model")
    with pytest.raises(ValueError):
        get_consensus_caller("Nope")


def test_bayesian_builtin_models():
    """All 8 reference built-in models are packaged and behave
    sensibly (reference: SimpleBayesianConsensusCaller::builtIns,
    src/SimpleBayesianConsensusCaller-Builtin.cpp:7-19)."""
    from shasta_tpu.consensus.bayesian import builtin_model_names

    names = builtin_model_names()
    for expect in (
        "guppy-2.3.1-a", "guppy-3.0.5-a", "guppy-3.4.4-a", "guppy-3.6.0-a",
        "guppy-5.0.7-a", "guppy-5.0.7-b", "bonito-0.3.1-a",
        "r10-guppy-3.4.8-a",
    ):
        assert expect in names, expect
    c = BayesianConsensusCaller("guppy-5.0.7-a")
    assert c.model.max_output_runlength == 50
    assert c.model.max_input_runlength == 50
    # Unanimous short homopolymer observations predict themselves.
    for rep in (2, 3, 5, 8):
        bases = np.zeros(12, np.int64)
        reps = np.full(12, rep, np.int64)
        b, r = c(bases, reps)
        assert b == 0
        assert abs(r - rep) <= 1, (rep, r)


def test_bayesian_numbered_aliases():
    """Every numbered Bayesian model name the reference ships as a
    conf CSV (reference: conf/SimpleBayesianConsensusCaller-{N}.csv,
    N in 2,3,5..11) resolves to a real trained matrix, not the
    parametric fallback (VERDICT r2 item 9)."""
    import warnings

    from shasta_tpu.consensus.bayesian import (
        _NUMBERED_ALIASES,
        builtin_model_names,
        resolve_model,
    )

    assert "ecoli-flipflop-k12" in builtin_model_names()
    for num, name in _NUMBERED_ALIASES.items():
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # fallback warns — fail then
            m = resolve_model(num)
        assert m.name != "parametric-default", num
        assert m.name == resolve_model(name).name
    # The one model with no builtin header carries the reference's
    # model name from conf/SimpleBayesianConsensusCaller-2.csv.
    assert "flipflop" in resolve_model("2").name.lower()


def test_center_star_msa_identical():
    s = np.array([0, 1, 2, 3], np.uint8)
    rows = MSA.center_star_msa([s, s.copy(), s.copy()])
    for r in rows:
        assert np.array_equal(r, s)


def test_center_star_msa_indel():
    a = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    b = np.array([0, 1, 3, 0, 1], np.uint8)  # deletion of '2'
    rows = MSA.center_star_msa([a, b])
    assert rows[0].shape == rows[1].shape
    # Reconstruct originals by dropping gaps.
    assert np.array_equal(rows[0][rows[0] != 4], a)
    assert np.array_equal(rows[1][rows[1] != 4], b)


def test_poa_msa_basic():
    from shasta_tpu.consensus.msa import poa_msa, GAP

    seqs = [
        np.array([0, 1, 2, 3, 0, 1], np.uint8),
        np.array([0, 1, 3, 0, 1], np.uint8),      # deletion of the 2
        np.array([0, 1, 2, 3, 1, 1], np.uint8),   # SNP at position 4
    ]
    rows = poa_msa(seqs)
    assert len(rows) == 3
    width = rows[0].shape[0]
    assert all(r.shape[0] == width for r in rows)
    # Every row reproduces its sequence when gaps are removed.
    for r, s in zip(rows, seqs):
        assert np.array_equal(r[r != GAP], s)
    # The deletion aligns as a single gap column, not an extension.
    assert width == 6
    assert int((rows[1] == GAP).sum()) == 1


def test_poa_msa_insertion_shared():
    from shasta_tpu.consensus.msa import poa_msa, GAP

    # Two sequences share an insertion the first lacks: POA should give
    # them the SAME column (center-star against seqs[0] cannot know).
    seqs = [
        np.array([0, 1, 2, 3], np.uint8),
        np.array([0, 1, 3, 2, 3], np.uint8),
        np.array([0, 1, 3, 2, 3], np.uint8),
    ]
    rows = poa_msa(seqs)
    assert np.array_equal(rows[1], rows[2])
    for r, s in zip(rows, seqs):
        assert np.array_equal(r[r != GAP], s)


def test_poa_msa_single_and_empty():
    from shasta_tpu.consensus.msa import poa_msa

    assert poa_msa([]) == []
    one = [np.array([1, 2, 3], np.uint8)]
    rows = poa_msa(one)
    assert np.array_equal(rows[0], one[0])


def test_poa_majority_consensus_beats_center_star_case():
    from shasta_tpu.consensus.msa import poa_msa, GAP

    # 1 noisy read first (highest frequency slot) + 4 clean reads: the
    # per-column majority over the POA MSA recovers the clean sequence.
    clean = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    noisy = np.array([0, 1, 3, 3, 0, 2, 2, 3], np.uint8)
    seqs = [noisy] + [clean] * 4
    rows = poa_msa(seqs)
    width = rows[0].shape[0]
    cons = []
    for c in range(width):
        col = [int(r[c]) for r in rows]
        vals, counts = np.unique(col, return_counts=True)
        best = vals[np.argmax(counts)]
        if best != GAP:
            cons.append(best)
    assert np.array_equal(np.array(cons, np.uint8), clean)


def test_bayesian_consensus_columns_matches_percolumn():
    """The vectorized column consensus equals per-column calls on
    random MSA matrices (incl. gap columns and empty observations)."""
    from shasta_tpu.consensus.bayesian import BayesianConsensusCaller, GAP

    caller = BayesianConsensusCaller("default")
    rng = np.random.default_rng(13)
    for _ in range(5):
        n, w = int(rng.integers(2, 9)), int(rng.integers(1, 40))
        base_m = rng.integers(0, 5, (n, w)).astype(np.uint8)
        rep_m = rng.integers(1, 12, (n, w)).astype(np.int32)
        cb, cr = caller.consensus_columns(base_m, rep_m)
        for c in range(w):
            b, r = caller(base_m[:, c], rep_m[:, c])
            assert cb[c] == b, c
            if b != GAP:
                assert cr[c] == r, c


@pytest.mark.slow
def test_edge_consensus_fast_paths_match_loop(monkeypatch):
    """The native batched consensus (edge_consensus_batch) and the
    vectorized uniform-fill path must produce exactly the per-edge
    loop's output for every caller, on noisy data (polymorphic
    bubbles exercise the POA path)."""
    import os

    from shasta_tpu import native
    from shasta_tpu.consensus.bayesian import BayesianConsensusCaller
    from shasta_tpu.consensus.caller import (
        MedianConsensusCaller,
        ModalConsensusCaller,
    )
    from shasta_tpu.graph.assembly_graph import assemble_marker_graph_edges
    from tests.test_marker_graph import full_pipeline_to_marker_graph

    reads, markers, mg = full_pipeline_to_marker_graph(
        genome_size=12000, n_reads=90, read_len=2500, seed=17,
        error_rate=0.01,
    )

    def run(caller, native_on, uniform_on):
        monkeypatch.setenv(
            "SHASTA_TPU_NATIVE_CONSENSUS", "1" if native_on else "0"
        )
        monkeypatch.setenv(
            "SHASTA_TPU_UNIFORM_FAST", "1" if uniform_on else "0"
        )
        return assemble_marker_graph_edges(reads, markers, mg, caller=caller)

    for caller in (
        ModalConsensusCaller(),
        MedianConsensusCaller(),
        BayesianConsensusCaller(),
    ):
        name = caller.name
        ref = run(caller, False, False)
        uni = run(caller, False, True)
        for f in ("offsets", "seq", "rep", "overlap"):
            assert np.array_equal(
                getattr(ref, f), getattr(uni, f)
            ), (name, "uniform", f)
        if native.available():
            nat = run(caller, True, False)
            for f in ("offsets", "seq", "rep", "overlap"):
                assert np.array_equal(
                    getattr(ref, f), getattr(nat, f)
                ), (name, "native", f)


def test_vertex_consensus_chunked_matches_whole_graph():
    """assemble_marker_graph_vertices processes vertex-aligned marker
    chunks; forcing many tiny chunks must reproduce the single-chunk
    (whole-graph) result exactly, for both repeat-count callers."""
    from shasta_tpu.graph.assembly_graph import (
        assemble_marker_graph_vertices,
    )
    from tests.test_marker_graph import full_pipeline_to_marker_graph

    reads, markers, mg = full_pipeline_to_marker_graph(
        genome_size=6000, n_reads=60, read_len=1500, seed=23,
        error_rate=0.01,
    )
    assert mg.vertex_count > 100
    for caller in ("Modal", "Median"):
        whole = assemble_marker_graph_vertices(
            reads, markers, mg, caller=caller, chunk_markers=1 << 60
        )
        tiny = assemble_marker_graph_vertices(
            reads, markers, mg, caller=caller, chunk_markers=7
        )
        assert np.array_equal(whole, tiny), caller
