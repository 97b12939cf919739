from .rest_posts import PaginatedPostsDataSource, register_posts_source

__all__ = ["PaginatedPostsDataSource", "register_posts_source"]
