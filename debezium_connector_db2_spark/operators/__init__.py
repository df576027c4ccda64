"""DataFrame kernels: the reference's operator inventory (SURVEY.md §2)."""
