"""Ray-Data-native document-extraction engine.

A brand-new engine with the query / data-processing capabilities of the
reference ``Rutuj912/medical-and-charity-document-extraction-system``
(a FastAPI OCR service), re-expressed as batch pipelines over
``ray.data.Dataset`` of interleaved text+media documents:

    (doc_id: string,
     spans: list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>)

Main entry points:

- :func:`medical_and_charity_document_extraction_system_ray.pipelines.extraction.extract_documents`
  — the flagship pipeline (classify -> explode -> extract (actor pool)
  -> groupby(doc_id) reassembly).
- :mod:`medical_and_charity_document_extraction_system_ray.oracle`
  — pure-python document-at-a-time reference semantics used as the
  conformance oracle in tests.
- :mod:`medical_and_charity_document_extraction_system_ray.fixtures`
  — deterministic synthetic interleaved-document tables.

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by the caller (tests / bench.py / the driver).
"""

__version__ = "0.1.0"
