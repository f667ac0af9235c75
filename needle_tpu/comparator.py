"""placeholder"""
class Comparator:  # noqa
    def __init__(self, *a, **k):
        raise NotImplementedError
class SearchResult:  # noqa
    pass
