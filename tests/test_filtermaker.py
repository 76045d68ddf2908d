"""Filter code-gen parity (reference filtermaker.py -> deemp.h): the
generated C++ tables + native StreamFilter reproduce scipy's lfilter
impulse responses exactly."""

import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.signal as sps

from ld_decode_tpu.utils import filtermaker as FM

NPTS = 64
PROBE = r'''
#include <cstdio>
#include "ldd_filters.h"
int main() {
    auto run = [](ldd::StreamFilter f, const char *name) {
        std::printf("%%s", name);
        for (int i = 0; i < %(npts)d; ++i)
            std::printf(" %%.17e", f.feed(i == 0 ? 1.0 : 0.0));
        std::printf("\n");
    };
    run(make_f_deemp_ntsc(), "deemp_ntsc");
    run(make_f_deemp_vhs(), "deemp_vhs");
    run(make_f_v05(), "v05");
    run(make_f_cx_a500_48k(), "cx_a500_48k");
    run(make_f_comb_colorlpi(), "comb_colorlpi");
    run(make_f_audio_lpf(), "audio_lpf");
    run(make_f_ref_boost(), "ref_boost");
    run(make_f_ref_esync4(), "ref_esync4");
    run(make_f_ref_syncid8(), "ref_syncid8");
    run(make_f_ref_audiolp(), "ref_audiolp");
    run(make_f_ref_leftbp(), "ref_leftbp");
    run(make_f_ref_efm8(), "ref_efm8");
    return 0;
}
''' % {'npts': NPTS}


def test_generated_header_compiles_and_matches_scipy(tmp_path):
    inv = FM.generate(str(tmp_path / 'ldd_filters.h'))
    assert len(inv) >= 17

    src = tmp_path / 'probe.cpp'
    src.write_text(PROBE)
    exe = tmp_path / 'probe'
    native = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'native')
    subprocess.run(['g++', '-std=c++17', '-O2', f'-I{native}',
                    f'-I{tmp_path}', str(src), '-o', str(exe)],
                   check=True, capture_output=True)
    out = subprocess.run([str(exe)], check=True, capture_output=True,
                         text=True).stdout

    impulse = np.zeros(NPTS)
    impulse[0] = 1.0
    got = {}
    for line in out.strip().splitlines():
        parts = line.split()
        got[parts[0]] = np.array([float(v) for v in parts[1:]])
    assert len(got) == 12
    for name, vals in got.items():
        b, a = inv[name]
        want = sps.lfilter(b, a, impulse)
        np.testing.assert_allclose(vals, want, rtol=0, atol=1e-12,
                                   err_msg=name)


def test_inventory_reproduces_decode_designs():
    """The emitted deemp tables are the exact designs the demod bank
    consumes (single source of truth: ops/filters.py deemp_ba)."""
    from ld_decode_tpu.ops import filters as F
    from ld_decode_tpu.utils.params import DecoderConfig
    inv = FM.design_inventory()
    for system in ('NTSC', 'PAL', 'VHS'):
        cfg = DecoderConfig(system=system, freq_mhz=40.0)
        b, a = F.deemp_ba(cfg)
        ib, ia = inv[f'deemp_{system.lower()}']
        np.testing.assert_array_equal(ib, np.atleast_1d(b))
        np.testing.assert_array_equal(ia, np.atleast_1d(a))


def test_committed_header_is_current():
    """native/ldd_filters.h ('do not edit') must equal the generator's
    output — regenerate via `python -m ld_decode_tpu.utils.filtermaker`
    whenever a filter design changes."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'native', 'ldd_filters.h')
    want, _inv = FM.render_header()
    with open(path) as f:
        assert f.read() == want


REF_DEEMP_H = '/root/reference/deemp.h'


@pytest.mark.skipif(not os.path.exists(REF_DEEMP_H),
                    reason='reference deemp.h not present')
def test_reference_inventory_matches_deemp_h():
    """Our regenerated designs must numerically match the reference's own
    generated tables (deemp.h), name for name — the strongest possible
    oracle for the code-gen inventory."""
    import re
    with open(REF_DEEMP_H) as f:
        text = f.read()
    tables = {}
    for m in re.finditer(
            r'std::vector<double>\s+c_(\w+)_([ab])\s*=\s*\{([^}]*)\};',
            text):
        vals = np.array([float(v) for v in m.group(3).replace(',', ' ')
                         .split()])
        tables.setdefault(m.group(1), {})[m.group(2)] = vals

    inv = FM.reference_inventory()
    missing = [n for n in inv if n not in tables]
    assert not missing, missing
    for name, (b, a) in inv.items():
        rb, ra = tables[name]['b'], tables[name].get('a', np.ones(1))
        np.testing.assert_allclose(b, rb, rtol=1e-6, atol=1e-12,
                                   err_msg=f'{name} b')
        np.testing.assert_allclose(a, ra, rtol=1e-6, atol=1e-12,
                                   err_msg=f'{name} a')
    # offset constants
    for k, v in FM.REFERENCE_OFFSETS.items():
        m = re.search(rf'const int {k} = (-?\d+);', text)
        assert m and int(m.group(1)) == v, k
