"""placeholder"""
class Analyzer:  # noqa
    def __init__(self, *a, **k):
        raise NotImplementedError
