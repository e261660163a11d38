# Root conftest so pytest puts /root/repo on sys.path (raykg importable).


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
