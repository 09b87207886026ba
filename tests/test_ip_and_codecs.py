"""IPv6/u128 correctness (VERDICT missing #6) and column value codecs."""

import ipaddress

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.fastfield import (
    CODEC_BITPACKED,
    CODEC_LINEAR,
    CODEC_RAW,
    _codec_decode,
    _codec_encode,
)


class TestIp:
    @pytest.fixture(scope="class")
    def setup(self):
        b = tt.Schema.builder()
        b.add_ip_addr_field("ip", tt.INDEXED | tt.FAST)
        b.add_text_field("name", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        self_ips = [
            "127.0.0.1",
            "10.0.0.1",
            "10.0.0.200",
            "2001:db8::1",
            "2001:db8::ffff:ffff:ffff",
            "::1",
        ]
        for i, ip in enumerate(self_ips):
            w.add_document(tt.Document(ip=ip, name=f"host{i}"))
        w.commit()
        w.close()
        return index, self_ips

    def test_ipv6_exact_term(self, setup):
        index, ips = setup
        s = index.reader().searcher()
        for ip in ips:
            q = tt.TermQuery(tt.Term.from_field_ip("ip", ip))
            assert s.search(q, tt.Count()) == 1, ip

    def test_ipv6_beyond_u64_no_overflow(self, setup):
        index, _ = setup
        s = index.reader().searcher()
        # value > 2^64: would collide/overflow under a 64-bit coercion
        big = ipaddress.ip_address("2001:db8::ffff:ffff:ffff")
        assert int(big) > 2**64
        q = tt.TermQuery(tt.Term.from_field_ip("ip", big))
        assert s.search(q, tt.Count()) == 1

    def test_ip_range_fast_field(self, setup):
        index, _ = setup
        s = index.reader().searcher()
        q = tt.RangeQuery("ip", "10.0.0.0", "10.0.0.255")
        assert s.search(q, tt.Count()) == 2
        q = tt.RangeQuery("ip", "2001:db8::", "2001:db8::ffff:ffff:ffff")
        assert s.search(q, tt.Count()) == 2
        q = tt.RangeQuery(
            "ip", "2001:db8::", "2001:db8::ffff:ffff:ffff",
            include_upper=False,
        )
        assert s.search(q, tt.Count()) == 1

    def test_ip_fast_value_roundtrip(self, setup):
        from tantivy_tpu.schema.term import bytes_to_ip, ip_to_bytes

        index, ips = setup
        s = index.reader().searcher()
        reader = s.segment_readers()[0]
        col = reader.fast_fields().column("ip")
        stored = {bytes_to_ip(col.values_for_doc(d)[0]) for d in range(6)}
        assert stored == {ipaddress.ip_address(ip) for ip in ips}
        # order preservation: byte keys sort like numeric IPs
        a, b = ip_to_bytes("10.0.0.1"), ip_to_bytes("10.0.0.200")
        assert a < b


class TestColumnCodecs:
    def roundtrip(self, vals):
        enc = _codec_encode(np.asarray(vals, dtype=np.uint64))
        arrays = {f"p/{k}": v for k, v in enc.items()}
        dec = _codec_decode(arrays, "p/")
        np.testing.assert_array_equal(dec, np.asarray(vals, dtype=np.uint64))
        return int(enc["vmeta"][0]), enc

    def test_bitpacked_small_range(self):
        codec, enc = self.roundtrip([1000, 1001, 1007, 1003] * 64)
        assert codec == CODEC_BITPACKED
        assert enc["values"].nbytes < 256 * 8 // 4

    def test_linear_monotonic(self):
        base = np.arange(1000, dtype=np.uint64) * 997 + 12345
        noise = np.array([i % 3 for i in range(1000)], dtype=np.uint64)
        codec, enc = self.roundtrip(base + noise)
        assert codec == CODEC_LINEAR
        assert enc["values"].nbytes < 1000  # ~2 bits/value vs 8 bytes raw

    def test_raw_wide_range(self):
        vals = [0, 2**63, 2**64 - 1, 5]
        codec, _ = self.roundtrip(vals)
        assert codec == CODEC_RAW

    def test_full_column_roundtrip_via_index(self):
        b = tt.Schema.builder()
        b.add_u64_field("n", tt.FAST)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        for i in range(300):
            w.add_document(tt.Document(n=i * 7 + 100))
        w.commit()
        w.close()
        s = index.reader().searcher()
        col = s.segment_readers()[0].fast_fields().column("n")
        assert [col.first(d) for d in range(300)] == [
            i * 7 + 100 for i in range(300)
        ]
        assert s.search(tt.RangeQuery("n", 100, 121), tt.Count()) == 4


class TestBlockwiseLinear:
    """Reference `columnar/src/column_values/u64_based/blockwise_linear.rs`:
    per-512-block line fits win on locally-linear columns with kinks."""

    def test_roundtrip_and_selection(self):
        import numpy as np

        from tantivy_tpu.fastfield import (
            CODEC_BLOCKWISE,
            _codec_decode,
            _codec_encode,
        )

        rng = np.random.default_rng(8)
        # monotonic with a rate change halfway + small jitter: globally
        # non-linear (huge Linear residuals), locally near-linear
        n = 4096
        a = np.arange(n // 2, dtype=np.uint64) * 10
        b = a[-1] + np.arange(n // 2, dtype=np.uint64) * 1000
        vals = np.concatenate([a, b])
        vals += rng.integers(0, 3, n).astype(np.uint64)
        vals = np.sort(vals)
        enc = _codec_encode(vals)
        assert int(enc["vmeta"][0]) == CODEC_BLOCKWISE
        dec = _codec_decode({"x" + k: v for k, v in enc.items()}, "x")
        assert np.array_equal(dec, vals)

    def test_column_roundtrip_through_index(self):
        import numpy as np

        import tantivy_tpu as tt

        b = tt.Schema.builder()
        b.add_u64_field("ts", tt.FAST)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        vals = []
        for i in range(3000):
            v = i * 7 + (i // 1500) * 100000 + (i % 3)
            vals.append(v)
            w.add_document(tt.Document(ts=v))
        w.commit()
        w.close()
        s = index.reader().searcher()
        col = s.segment_readers()[0].fast_fields().column("ts")
        assert np.array_equal(col.values, np.array(vals, dtype=np.uint64))
