"""Framework exceptions (⇄ reference src/shelf/exceptions.py)."""


class ShelfError(Exception):
    """Base class for framework errors."""


class ValidationError(ShelfError):
    """Metadata or data validation failed."""


class StepDefinitionError(ShelfError):
    """A step URI / config / script is malformed or missing."""
