"""Leveled logging (ld_decode_tpu/utils/log.py) — the reference's Qt
message-handler semantics (app/tbc/main.cpp:43-79,105-110)."""

from ld_decode_tpu.utils import log


def _lines(capsys):
    return [l for l in capsys.readouterr().err.splitlines() if l]


def test_levels_filter(capsys):
    log.set_level(log.INFO)
    log.debug('hidden')
    log.info('shown')
    log.warning('also shown')
    out = _lines(capsys)
    assert out == ['Info: shown', 'Warning: also shown']


def test_quiet_wins_over_debug(capsys):
    log.configure_from_flags(quiet=True, debug=True)
    assert log.get_level() == log.WARNING
    log.info('nope')
    log.critical('yes')
    assert _lines(capsys) == ['Critical: yes']
    log.configure_from_flags()          # restore default
    assert log.get_level() == log.INFO


def test_progress_whole_percent_dedup(capsys):
    log.set_level(log.INFO)
    for done in (0, 4, 5, 9, 9.4, 100, 140):
        log.progress(done, 100.0)
    assert _lines(capsys) == ['Info: 0% decoded', 'Info: 4% decoded',
                              'Info: 5% decoded', 'Info: 9% decoded',
                              'Info: 100% decoded']


def test_cli_flags_exist():
    import lddecode_tpu
    args = lddecode_tpu.parse_args(['in.lds', 'out', '-q', '-d'])
    assert args.quiet and args.debug
