-- Stage-2 side input: the active-user id set for the activity window.
-- Loop-INVARIANT (depends only on the date-window params, never on the
-- iteration), so the orchestrator runs this ONCE before the iteration loop
-- and caches the view — the reference re-runs it per (country ×
-- distribution) iteration inside 2-basedata_df_query.sql.
select distinct o_custkey as user_id
from {orders_view}
where
    o_orderdate >= timestamp '{activity_from}'
    and o_orderdate < timestamp '{activity_to}'
