"""Normalization-operator queries over the embedded Monday-shaped fixtures.

These pin the reference's transform semantics (SURVEY §2.2) exactly: the
oracle for each is the literal VALUES of the hand-derived expected output, so
any drift in flatten/EAV/cast behavior fails the hash check. The fixtures —
not the sf tables — are the input (sf_dir is ignored), because the nested
document shape only exists pre-flattening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import fixtures as FX
from ..normalize import (
    board_df,
    extract_personnel_costs,
    extract_projects,
    extract_subitems,
    extract_supplier_costs,
    extract_travel_costs,
    items_df,
)
from .registry import register

_D = FX.RUN_DATE
_TS = FX.RUN_TS


@register(
    "normalize_projects",
    oracle=f"""
    SELECT CAST(extraction_date AS DATE) AS extraction_date,
           CAST(extraction_timestamp AS TIMESTAMP) AS extraction_timestamp,
           project_id, project_name, po,
           CAST(data_avvio AS DATE) AS data_avvio,
           var_non_var, circolo, tipologia, stato_pipeline, aperto_chiuso,
           CAST(created_at AS TIMESTAMP) AS created_at,
           CAST(updated_at AS TIMESTAMP) AS updated_at
    FROM (VALUES
      (DATE '{_D}', TIMESTAMP '{_TS}', '101', 'Alpha', 'Alice',
       DATE '2025-06-01', 'Var', 'Radical', 'TipoA', 'Pipeline1', 'Aperto',
       TIMESTAMP '2025-06-20 07:10:00', TIMESTAMP '2025-06-24 18:30:00'),
      (DATE '{_D}', TIMESTAMP '{_TS}', '102', 'Beta', NULL,
       NULL, NULL, 'WoW', NULL, NULL, NULL, NULL, NULL),
      (DATE '{_D}', TIMESTAMP '{_TS}', '103', 'Gamma', NULL,
       NULL, NULL, NULL, NULL, NULL, NULL,
       TIMESTAMP '2025-06-25 07:10:00', NULL)
    ) AS t(extraction_date, extraction_timestamp, project_id, project_name, po,
           data_avvio, var_non_var, circolo, tipologia, stato_pipeline,
           aperto_chiuso, created_at, updated_at)
    """,
    doc="O-5/O-7/O-10/O-11 + F-1/F-2/F-3: flatten + EAV→wide by column id "
        "with empty-string guards, silent-null date parse, lineage stamps.",
)
def normalize_projects(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_projects(items_df(board_df(spark, FX.PROJECTS_BOARD)), _D, _TS)


@register(
    "normalize_subitems",
    oracle=f"""
    SELECT CAST(extraction_date AS DATE) AS extraction_date,
           CAST(extraction_timestamp AS TIMESTAMP) AS extraction_timestamp,
           subitem_id, project_id, subitem_name, po,
           CAST(timeline_start AS DATE) AS timeline_start,
           CAST(timeline_end AS DATE) AS timeline_end,
           CAST(revenue_amount AS DOUBLE) AS revenue_amount,
           status, CAST(tipologia AS VARCHAR) AS tipologia,
           CAST(created_at AS TIMESTAMP) AS created_at,
           CAST(updated_at AS TIMESTAMP) AS updated_at
    FROM (VALUES
      (DATE '{_D}', TIMESTAMP '{_TS}', '201', '101', 'Sub1', 'Bob',
       DATE '2025-01-15', DATE '2025-02-01', 1500.5, 'Done', NULL,
       TIMESTAMP '2025-06-21 08:00:00', NULL),
      (DATE '{_D}', TIMESTAMP '{_TS}', '202', '101', 'Sub2', NULL,
       NULL, NULL, 0.0, NULL, NULL, NULL, NULL),
      (DATE '{_D}', TIMESTAMP '{_TS}', '203', '102', 'Sub3', 'Y',
       DATE '2025-03-01', DATE '2025-03-31', 100.0, 'First', NULL,
       TIMESTAMP '2025-06-22 10:00:00', TIMESTAMP '2025-06-23 10:00:00')
    ) AS t(extraction_date, extraction_timestamp, subitem_id, project_id,
           subitem_name, po, timeline_start, timeline_end, revenue_amount,
           status, tipologia, created_at, updated_at)
    """,
    doc="O-6/O-8/O-9/O-19 + F-1/F-4: child flatten with parent FK, EAV→wide "
        "by column type, first-match-wins status, last-successful-parse "
        "numbers/timeline, partial timeline destructure (start updates even "
        "when the end half fails to parse, ref :313-319).",
)
def normalize_subitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_subitems(items_df(board_df(spark, FX.PROJECTS_BOARD)), _D, _TS)


@register(
    "normalize_personnel_costs",
    oracle=f"""
    SELECT CAST(extraction_date AS DATE) AS extraction_date,
           CAST(extraction_timestamp AS TIMESTAMP) AS extraction_timestamp,
           cost_id, cost_name, person,
           CAST(amount AS DOUBLE) AS amount,
           linked_subitem_id, linked_subitem_name,
           CAST(created_at AS TIMESTAMP) AS created_at,
           CAST(updated_at AS TIMESTAMP) AS updated_at
    FROM (VALUES
      (DATE '{_D}', TIMESTAMP '{_TS}', '301', 'Cost A', 'Alice', 250.75,
       '201', 'Sub1', TIMESTAMP '2025-06-01 00:00:00', NULL),
      (DATE '{_D}', TIMESTAMP '{_TS}', '302', 'Cost B', NULL, 0.0,
       NULL, 'SubX', NULL, NULL),
      (DATE '{_D}', TIMESTAMP '{_TS}', '303', 'Cost C', NULL, 0.0,
       NULL, NULL, NULL, NULL)
    ) AS t(extraction_date, extraction_timestamp, cost_id, cost_name, person,
           amount, linked_subitem_id, linked_subitem_name, created_at, updated_at)
    """,
    doc="O-20/F-5: FK recovery from link-cell JSON with silent-null on "
        "malformed/{}/empty-list; empty link text skips the whole cell.",
)
def normalize_personnel_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_personnel_costs(items_df(board_df(spark, FX.PERSONNEL_BOARD)), _D, _TS)


@register(
    "normalize_travel_costs",
    oracle=f"""
    SELECT CAST(extraction_date AS DATE) AS extraction_date,
           CAST(extraction_timestamp AS TIMESTAMP) AS extraction_timestamp,
           cost_id, cost_name, person,
           CAST(amount AS DOUBLE) AS amount,
           CAST(date_ AS DATE) AS date,
           stato, pagata_con, linked_subitem_id, linked_subitem_name,
           CAST(created_at AS TIMESTAMP) AS created_at,
           CAST(updated_at AS TIMESTAMP) AS updated_at
    FROM (VALUES
      (DATE '{_D}', TIMESTAMP '{_TS}', '401', 'Trip A', 'Carol', 99.99,
       DATE '2025-06-10', 'Pagata', 'Carta aziendale', '202', 'Sub2',
       TIMESTAMP '2025-06-10 12:00:00', TIMESTAMP '2025-06-11 12:00:00'),
      (DATE '{_D}', TIMESTAMP '{_TS}', '402', 'Trip B', NULL, 0.0,
       NULL, NULL, NULL, NULL, 'SubY', NULL, NULL)
    ) AS t(extraction_date, extraction_timestamp, cost_id, cost_name, person,
           amount, date_, stato, pagata_con, linked_subitem_id,
           linked_subitem_name, created_at, updated_at)
    """,
    doc="Travel-cost mapping: adds date/stato/pagata_con; malformed link "
        "JSON yields name-without-id (ref :467-475).",
)
def normalize_travel_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_travel_costs(items_df(board_df(spark, FX.TRAVEL_BOARD)), _D, _TS)


@register(
    "normalize_supplier_costs",
    oracle=f"""
    SELECT CAST(extraction_date AS DATE) AS extraction_date,
           CAST(extraction_timestamp AS TIMESTAMP) AS extraction_timestamp,
           cost_id, cost_name,
           CAST(imponibile AS DOUBLE) AS imponibile,
           tipologia, stato_ordine,
           CAST(iva AS DOUBLE) AS iva,
           linked_subitem_id, linked_subitem_name,
           CAST(created_at AS TIMESTAMP) AS created_at,
           CAST(updated_at AS TIMESTAMP) AS updated_at
    FROM (VALUES
      (DATE '{_D}', TIMESTAMP '{_TS}', '501', 'Supplier A', 1000.0,
       'TipoX', 'Ordinato', 220.0, '201', 'Sub1',
       TIMESTAMP '2025-05-01 09:30:00', NULL),
      (DATE '{_D}', TIMESTAMP '{_TS}', '502', 'Supplier B', 0.0,
       NULL, NULL, 0.0, NULL, 'SubZ', NULL, NULL)
    ) AS t(extraction_date, extraction_timestamp, cost_id, cost_name,
           imponibile, tipologia, stato_ordine, iva, linked_subitem_id,
           linked_subitem_name, created_at, updated_at)
    """,
    doc="Supplier-cost mapping: imponibile/iva double defaults 0.0, "
        "empty linkedPulseIds list → null id (ref :484-560).",
)
def normalize_supplier_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_supplier_costs(items_df(board_df(spark, FX.SUPPLIER_BOARD)), _D, _TS)
