# Root conftest so pytest puts /root/repo on sys.path (raykg importable).
