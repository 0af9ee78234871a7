"""Sources: distributed XML corpus ingestion."""

from .xml_source import XmlCorpus, read_xml_corpus  # noqa: F401
