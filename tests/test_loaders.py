"""Loader pack/unpack round trips, native-vs-numpy parity, file loading."""

import io

import numpy as np
import pytest

from ld_decode_tpu.io import loaders as L
from ld_decode_tpu.io import native_unpack as NU


def test_pack_unpack_4_40_roundtrip():
    rng = np.random.default_rng(0)
    samples = rng.integers(0, 1024, 4096).astype(np.uint16)
    packed = L.pack_data_4_40(samples)
    raw = np.frombuffer(packed.tobytes(), np.uint8)
    out = L.unpack_data_4_40(raw, 4096, 0)
    np.testing.assert_array_equal(out, samples)


def test_pack_unpack_3_32_roundtrip():
    rng = np.random.default_rng(1)
    samples = rng.integers(0, 1024, 3 * 1024).astype(np.uint16)
    words = L.pack_data_3_32(samples)
    f = io.BytesIO(words.tobytes())
    out = L.load_packed_3_32(f, 0, len(samples) - 4)
    np.testing.assert_array_equal(out, samples[:len(samples) - 4].astype(np.int16))


@pytest.mark.skipif(not NU.available(), reason='native lib unavailable')
def test_native_matches_numpy():
    rng = np.random.default_rng(2)
    samples = rng.integers(0, 1024, 4000).astype(np.uint16)
    raw = np.frombuffer(L.pack_data_4_40(samples).tobytes(), np.uint8)
    a = NU.unpack_4_40(raw, 3990, 2)
    groups = len(raw) // 5
    b = raw[:groups * 5].reshape(-1, 5).astype(np.uint16)
    ref = np.empty((groups, 4), np.uint16)
    ref[:, 0] = (b[:, 0] << 2) | (b[:, 1] >> 6)
    ref[:, 1] = ((b[:, 1] & 0x3f) << 4) | (b[:, 2] >> 4)
    ref[:, 2] = ((b[:, 2] & 0x0f) << 6) | (b[:, 3] >> 2)
    ref[:, 3] = ((b[:, 3] & 0x03) << 8) | b[:, 4]
    np.testing.assert_array_equal(a, ref.reshape(-1)[2:2 + 3990])

    words = L.pack_data_3_32(samples[:3999])
    c = NU.unpack_3_32(words, 3000, 1)
    d = np.stack([(words & 0x3ff), (words >> 10) & 0x3ff,
                  (words >> 20) & 0x3ff], axis=1).astype(np.int16)
    np.testing.assert_array_equal(c, d.reshape(-1)[1:3001])


def test_lds_file_loader(tmp_path):
    rng = np.random.default_rng(3)
    samples = rng.integers(0, 1024, 20000).astype(np.uint16)
    path = tmp_path / 'cap.lds'
    path.write_bytes(L.pack_data_4_40(samples).tobytes())
    with open(path, 'rb') as f:
        ld = L.loader_for_path(str(path))
        out = ld(f, 123, 10000)
        np.testing.assert_array_equal(out, samples[123:10123])
        assert ld(f, 15000, 10000) is None     # EOF short read


def test_oracle_loader_parity(tmp_path):
    """Our .lds loader vs the reference load_packed_data_4_40."""
    import oracle
    core = oracle.load_reference()
    import lddutils
    rng = np.random.default_rng(4)
    samples = rng.integers(0, 1024, 16000).astype(np.uint16)
    path = tmp_path / 'cap.lds'
    path.write_bytes(L.pack_data_4_40(samples).tobytes())
    with open(path, 'rb') as f:
        ref = lddutils.load_packed_data_4_40(f, 1001, 8000)
        ours = L.load_packed_4_40(f, 1001, 8000)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_bytes_per_sample_for_path():
    """On-disk density used by the CLI's frame-count/progress math."""
    assert L.bytes_per_sample_for_path('x.lds') == 5 / 4
    assert L.bytes_per_sample_for_path('x.r30') == 4 / 3
    assert L.bytes_per_sample_for_path('x.r16') == 2.0
    assert L.bytes_per_sample_for_path('x.raw') == 1.0
    assert L.bytes_per_sample_for_path('x.u8') == 1.0
    assert L.bytes_per_sample_for_path('noext') == 5 / 4
