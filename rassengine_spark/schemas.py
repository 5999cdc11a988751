"""Engine table schemas (SURVEY.md §1).

The reference stores one wide denormalized JSON document per FHIR resource or
text chunk in OpenSearch (mapping defined at app/main.py:350-579). Here that
becomes two columnar tables — nulls are nearly free in Parquet, so the sparse
wide layout costs little and keeps every query join-free:

- ``documents`` (doc_type='structured'): one row per FHIR resource
- ``chunks``    (doc_type='unstructured'): one row per text chunk + embedding

plus the Prisma chat tables (prisma/schema.prisma:10-38).

Partitioning at scale: write both corpus tables partitioned by ``user_id``
(the per-user-index analog, app/main.py:346-347) and bucketed/sorted by
``patientId`` (the ``_routing`` analog, app/main.py:1230) so per-patient
queries prune to one partition's bucket.
"""

from __future__ import annotations

from pyspark.sql.types import (ArrayType, DateType, FloatType, IntegerType,
                               StringType, StructField, StructType,
                               TimestampType)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


def _t(name: str) -> StructField:
    return StructField(name, TimestampType(), True)


# Wide structured-document schema (field groups at app/main.py:366-562)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("doc_type", StringType(), False),
        StructField("resourceType", StringType(), False),
        StructField("user_id", StringType(), False),
        _s("file_path"), _s("file_type"),
        # Patient
        _s("patientId"), _s("patientName"), _s("patientGender"),
        StructField("patientDOB", DateType(), True),
        _s("patientAddress"), _s("patientMaritalStatus"),
        StructField("patientMultipleBirth", IntegerType(), True),
        _s("patientTelecom"), _s("patientLanguage"),
        # Condition
        _s("conditionId"), _s("conditionCodeText"), _s("conditionCategory"),
        _s("conditionClinicalStatus"), _s("conditionVerificationStatus"),
        _t("conditionOnsetDateTime"), _t("conditionRecordedDate"),
        _s("conditionSeverity"), _s("conditionNote"),
        # Observation
        _s("observationId"), _s("observationCodeText"), _s("observationValue"),
        _s("observationUnit"), _s("observationInterpretation"),
        _t("observationEffectiveDateTime"), _t("observationIssued"),
        _s("observationReferenceRange"), _s("observationNote"),
        # Encounter
        _s("encounterId"), _s("encounterStatus"), _s("encounterClass"),
        _s("encounterType"), _s("encounterReasonCode"),
        _t("encounterStart"), _t("encounterEnd"), _s("encounterLocation"),
        _s("encounterServiceProvider"), _s("encounterParticipant"),
        _s("encounterNote"),
        # MedicationRequest
        _s("medRequestId"), _s("medRequestMedicationDisplay"),
        _t("medRequestAuthoredOn"), _s("medRequestIntent"),
        _s("medRequestStatus"), _s("medRequestPriority"),
        _s("medRequestDosageInstruction"), _s("medRequestDispenseRequest"),
        _s("medRequestNote"),
        # Procedure
        _s("procedureId"), _s("procedureCodeText"), _s("procedureStatus"),
        _t("procedurePerformedDateTime"), _s("procedureFollowUp"),
        _s("procedureNote"),
        # AllergyIntolerance
        _s("allergyId"), _s("allergyClinicalStatus"),
        _s("allergyVerificationStatus"), _s("allergyType"),
        _s("allergyCategory"), _s("allergyCriticality"), _s("allergyCodeText"),
        _t("allergyOnsetDateTime"), _s("allergyNote"),
        # Practitioner
        _s("practitionerId"), _s("practitionerName"), _s("practitionerGender"),
        _s("practitionerSpecialty"), _s("practitionerAddress"),
        _s("practitionerTelecom"),
        # Organization
        _s("organizationId"), _s("organizationName"), _s("organizationType"),
        _s("organizationAddress"), _s("organizationTelecom"),
    ]
)

CHUNKS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("doc_type", StringType(), False),
    StructField("resourceType", StringType(), True),
    StructField("user_id", StringType(), False),
    _s("file_path"), _s("file_type"), _s("patientId"),
    StructField("unstructuredText", StringType(), False),
    StructField("embedding", ArrayType(FloatType()), True),
])

USERS_SCHEMA = StructType([
    StructField("id", StringType(), False),
    _s("email"), _s("name"), _s("password"),
    _t("createdAt"), _t("updatedAt"),
])

CHATS_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("userId", StringType(), False),
    _s("title"), _t("createdAt"), _t("updatedAt"),
])

MESSAGES_SCHEMA = StructType([
    StructField("id", StringType(), False),
    StructField("chatId", StringType(), False),
    StructField("role", StringType(), False),
    StructField("content", StringType(), False),
    _t("createdAt"), _t("updatedAt"),
])

# Reference field groups (app/main.py:1403-1468), reused by the FHIR corpus
# search spec in pipeline/ask.py.
TEXT_FIELDS: list[str] = [
    "unstructuredText", "conditionNote", "observationNote", "encounterNote",
    "medRequestNote", "procedureNote", "allergyNote", "conditionCodeText",
    "observationCodeText", "observationValue", "encounterType",
    "encounterReasonCode", "encounterLocation", "medRequestMedicationDisplay",
    "medRequestDosageInstruction", "procedureCodeText", "procedureFollowUp",
    "allergyCodeText", "patientName", "patientAddress", "patientTelecom",
    "practitionerName", "practitionerAddress", "practitionerTelecom",
    "organizationName", "organizationAddress",
]

KEYWORD_FIELDS: list[str] = [
    "doc_id", "doc_type", "resourceType", "patientId", "patientGender",
    "patientMaritalStatus", "patientLanguage", "conditionClinicalStatus",
    "conditionVerificationStatus", "conditionCategory", "conditionSeverity",
    "observationUnit", "observationInterpretation", "encounterStatus",
    "encounterClass", "medRequestStatus", "medRequestIntent",
    "medRequestPriority", "procedureStatus", "allergyClinicalStatus",
    "allergyVerificationStatus", "allergyType", "allergyCategory",
    "allergyCriticality",
]

DATE_FIELDS: list[str] = [
    "conditionOnsetDateTime", "conditionRecordedDate",
    "observationEffectiveDateTime", "observationIssued", "encounterStart",
    "encounterEnd", "medRequestAuthoredOn", "procedurePerformedDateTime",
    "allergyOnsetDateTime",
]

STRUCTURED_FIELDS: list[str] = [
    "patientName", "patientGender", "conditionCodeText", "conditionSeverity",
    "observationCodeText", "observationValue", "observationUnit",
    "encounterType", "encounterReasonCode", "encounterLocation",
    "medRequestMedicationDisplay", "medRequestDosageInstruction",
    "procedureCodeText", "procedureFollowUp", "allergyCodeText",
    "practitionerName", "practitionerSpecialty", "organizationName",
    "organizationType",
]
