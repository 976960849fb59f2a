"""Weighted source mixing + sequence-packing manifest."""

import hashlib

import pytest

from rdflib_jsonld_spark.operators.curation import (
    pack_sequences, sample_mixture, temperature_rates)


def _bucket(doc_id, seed, buckets=1_000_000):
    return int(hashlib.md5(f"{doc_id}\x1f{seed}".encode()).hexdigest()[:8],
               16) % buckets


@pytest.mark.usefixtures("spark")
class TestSampleMixture:
    def _docs(self, spark, n=400):
        rows = [(i, f"src{i % 4}", f"text {i}") for i in range(n)]
        return spark.createDataFrame(rows, ["doc_id", "source", "text"])

    def test_matches_independent_hash(self, spark):
        docs = self._docs(spark)
        rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
        kept = {r.doc_id for r in
                sample_mixture(docs, rates, default_rate=0.25).collect()}
        want = set()
        for i in range(400):
            src = f"src{i % 4}"
            r = rates.get(src, 0.25)
            if _bucket(i, "mix-v1") < int(round(r * 1_000_000)):
                want.add(i)
        assert kept == want
        assert any(i % 4 == 0 for i in kept)          # rate 1 → all kept
        assert not any(i % 4 == 2 for i in kept)      # rate 0 → none

    def test_partitioning_independent(self, spark):
        docs = self._docs(spark)
        rates = {"src0": 0.3, "src1": 0.7}
        a = {r.doc_id for r in sample_mixture(docs, rates).collect()}
        b = {r.doc_id for r in
             sample_mixture(docs.repartition(13), rates).collect()}
        assert a == b

    def test_bad_rate_rejected(self, spark):
        with pytest.raises(ValueError):
            sample_mixture(self._docs(spark), {"src0": 1.5})

    def test_seed_rerolls(self, spark):
        docs = self._docs(spark)
        a = {r.doc_id for r in
             sample_mixture(docs, {}, default_rate=0.5, seed="s1").collect()}
        b = {r.doc_id for r in
             sample_mixture(docs, {}, default_rate=0.5, seed="s2").collect()}
        assert a != b


class TestTemperatureRates:
    COUNTS = {"big": 90_000, "mid": 9_000, "small": 1_000}

    def test_flat_temperature_is_uniform_rate(self):
        # T=1 → q_s ∝ c_s → every source keeps the same fraction
        r = temperature_rates(self.COUNTS, temperature=1.0,
                              target_fraction=0.4)
        assert all(v == pytest.approx(0.4) for v in r.values())

    def test_high_temperature_upweights_small_sources(self):
        r = temperature_rates(self.COUNTS, temperature=5.0,
                              target_fraction=0.4)
        assert r["small"] > r["big"]
        # expected kept total hits the target
        kept = sum(self.COUNTS[s] * r[s] for s in r)
        assert kept == pytest.approx(0.4 * sum(self.COUNTS.values()))

    def test_capping_waterfills(self):
        r = temperature_rates(self.COUNTS, temperature=100.0,
                              target_fraction=0.5)
        assert r["small"] == 1.0  # tiny source saturates
        kept = sum(self.COUNTS[s] * r[s] for s in r)
        assert kept == pytest.approx(0.5 * sum(self.COUNTS.values()))
        assert all(0.0 <= v <= 1.0 for v in r.values())

    def test_empty_and_bad_inputs(self):
        assert temperature_rates({}) == {}
        with pytest.raises(ValueError):
            temperature_rates(self.COUNTS, temperature=0.0)


@pytest.mark.usefixtures("spark")
class TestPackSequences:
    def _docs(self, spark):
        rows = [
            (0, "a b c"),              # 3 tokens
            (1, ""),                   # 0 tokens
            (2, "  x  "),              # 1 token
            (3, " ".join(["t"] * 10)),  # 10 tokens
            (4, "u v"),                # 2 tokens
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_manifest_matches_hand_computation(self, spark):
        # one shard → one global stream ordered by doc_id
        got = {r.doc_id: r for r in
               pack_sequences(self._docs(spark), seq_len=4,
                              shards=1).collect()}
        # offsets: 0:0..2, 1:3(empty), 2:3, 3:4..13, 4:14..15
        expect = {
            0: (3, 0, 0, 0, False),
            1: (0, 3, 0, 0, False),
            2: (1, 3, 0, 0, False),
            3: (10, 4, 1, 3, True),
            4: (2, 14, 3, 3, False),
        }
        for d, (n, off, fs, ls, st) in expect.items():
            r = got[d]
            assert (r.n_tokens, r.tok_offset, r.first_seq, r.last_seq,
                    r.straddles) == (n, off, fs, ls, st)

    def test_shard_assignment_deterministic_and_sharded(self, spark):
        rows = [(i, "w " * 5) for i in range(300)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        a = pack_sequences(docs, seq_len=8, shards=16).collect()
        b = pack_sequences(docs.repartition(7), seq_len=8,
                           shards=16).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        shards = {r.shard for r in a}
        assert len(shards) > 4  # spread over shards
        for r in a:
            assert r.shard == _bucket(r.doc_id, "pack-v1", 16)

    def test_offsets_are_contiguous_within_shard(self, spark):
        rows = [(i, "w " * (i % 7)) for i in range(100)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = pack_sequences(docs, seq_len=8, shards=4).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r)
        for rs in by_shard.values():
            rs.sort(key=lambda r: r.doc_id)
            off = 0
            for r in rs:
                assert r.tok_offset == off
                off += r.n_tokens

    def test_bad_params_rejected(self, spark):
        with pytest.raises(ValueError):
            pack_sequences(self._docs(spark), seq_len=0)


@pytest.mark.usefixtures("spark")
class TestRenderChat:
    def test_stable_turn_order_and_format(self, spark):
        from rdflib_jsonld_spark.operators.curation import (
            render_chat_documents)
        rows = [
            ("c1", 2, "assistant", "second"),
            ("c1", 1, "user", "first"),
            ("c1", 10, "user", "tenth"),
            ("c2", 0, "system", "solo"),
        ]
        df = spark.createDataFrame(
            rows, ["conv_id", "turn_idx", "role", "text"])
        got = {r.conv_id: (r.n_turns, r.doc_text)
               for r in render_chat_documents(df).collect()}
        # numeric turn order (10 after 2), not lexicographic
        assert got["c1"] == (3, "user: first\n\n"
                                "assistant: second\n\nuser: tenth")
        assert got["c2"] == (1, "system: solo")

    def test_partitioning_independent(self, spark):
        from rdflib_jsonld_spark.operators.curation import (
            render_chat_documents)
        rows = [(f"c{i % 5}", i, "user", f"t{i}") for i in range(60)]
        df = spark.createDataFrame(
            rows, ["conv_id", "turn_idx", "role", "text"])
        a = sorted(map(tuple, render_chat_documents(df).collect()))
        b = sorted(map(tuple,
                       render_chat_documents(df.repartition(7)).collect()))
        assert a == b
