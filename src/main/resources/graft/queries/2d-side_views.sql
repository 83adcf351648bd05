-- Stage-2 side input: per-user view counter. Loop-invariant — hoisted
-- before the iteration loop and cached; see 2a-side_activity.sql header.
select
    user_id,
    count(*) as n_views
from {cdc_view}
where event_type = 'view'
group by user_id
