"""Synthetic-corpus generator invariants (trinity_spark/fixtures.py)."""

from trinity_spark.fixtures import SEED, gen_transcripts


def test_exact_turn_count_when_geometric_draw_undershoots():
    """Regression: when the geometric conversation sizes summed to less than
    n_turns, searchsorted returned len(cum) and cum[n_conv-1] raised
    IndexError (seed 20 at n_turns=20 was a crashing instance)."""
    df = gen_transcripts(20, seed=20)
    assert len(df) == 20


def test_exact_turn_count_small_n_seed_sweep():
    for n in (8, 15, 33):
        for seed in range(12):
            assert len(gen_transcripts(n, seed=seed)) == n


def test_default_seed_is_deterministic():
    a = gen_transcripts(300, seed=SEED)
    b = gen_transcripts(300, seed=SEED)
    assert a.equals(b)


def test_write_transcripts_size_change_invalidates_stale_markers(tmp_path):
    """The parquet is shared across sizes at one path: overwriting with a
    different size must drop the previous size's marker, or a later call
    for the old size adopts the wrong corpus."""
    import pyarrow.parquet as pq

    from trinity_spark.fixtures import write_transcripts

    p = str(tmp_path / "corpus")
    write_transcripts(p, 200)
    write_transcripts(p, 100)
    out = write_transcripts(p, 200)  # must REGENERATE, not reuse 100 rows
    assert pq.read_metadata(out).num_rows == 200
