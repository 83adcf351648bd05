-- Stage-2 side input: per-user click counters. Loop-invariant — hoisted
-- before the iteration loop and cached; see 2a-side_activity.sql header.
select
    user_id,
    count(*) as n_clicks,
    sum(coalesce(value, 0)) as click_value
from {cdc_view}
where event_type = 'click'
group by user_id
